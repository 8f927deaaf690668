package graft.similarity

import graft.functions.{VectorBinary, VectorFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The QUANTIZED VECTOR artifact — the embedding-side loader export
  * completing the artifact set (tokens q170/q171, vocab q183/q184):
  * each embedding int8-quantized ([[graft.functions.Int8Quantize]],
  * the q42/q66/q92 scheme — `round(x·127/max|x|)`, bit-portable) and
  * packed one signed byte per component into a `binary` cell, published
  * as a catalog table through the atomic versioned pointer swap. A
  * retrieval service maps this 4×-smaller artifact instead of the
  * float originals; the quantized cosine's recall cost is the measured
  * q66 trade.
  *
  * All-zero vectors carry no direction and do not quantize (the
  * `max|x| > 0` gate every quantized path shares) — they are EXCLUDED
  * from the artifact rather than encoded as a zero buffer that would
  * read back as a valid-looking vector.
  */
object VectorStore {

  /** Quantize + pack + publish: one codegen scan (quantize and pack
    * are both native expressions), one parquet write through the
    * catalog publish — no shuffle anywhere.
    *
    * @return the published relation (idCol, dims, buf)
    */
  def exportVectors(emb: DataFrame, idCol: String, vecCol: String,
      catalog: graft.catalog.ParquetCatalog, name: String): DataFrame = {
    val rows = emb
      .withColumn("__q", VectorFunctions.quantInt8Col(col(vecCol)))
      .filter(col("__q").isNotNull)
      .select(col(idCol), size(col(vecCol)).cast("long").as("dims"),
        VectorBinary.packI8Col(col("__q")).as("buf"))
    if (!catalog.exists(name)) catalog.create(name, rows.schema)
    catalog.overwrite(name, rows)
    rows
  }

  /** Read back the published artifact: (idCol, dims, buf). */
  def readVectors(catalog: graft.catalog.ParquetCatalog,
      name: String): DataFrame = catalog.table(name)

  /** [[readVectors]] with the buffer decoded to an `array<int>` of
    * int8 components — the consumer shape for quantized dot products
    * ([[graft.functions.VectorFunctions.dotInt]]).
    */
  def vectorsDecoded(vectors: DataFrame): DataFrame =
    vectors.withColumn("qvec", VectorBinary.unpackI8Col(col("buf")))
}
