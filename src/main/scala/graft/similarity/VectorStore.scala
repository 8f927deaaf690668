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

  /** Log-structured APPEND: quantize + pack the new batch and publish
    * the union with the stored artifact as the next catalog version —
    * stored buffers carry VERBATIM (never decoded or re-quantized;
    * quantization is per-vector, so appending cannot change an
    * existing byte). Contract: appended over any batching of
    * disjoint-id batches == [[exportVectors]] over the union — and
    * unlike the token tape (order-dependent placement, q179/q180's
    * monotone-ids contract) this holds for ANY arrival order. A
    * missing table degrades to a fresh export.
    */
  def appendVectors(emb: DataFrame, idCol: String, vecCol: String,
      catalog: graft.catalog.ParquetCatalog, name: String): DataFrame = {
    val rows = emb
      .withColumn("__q", VectorFunctions.quantInt8Col(col(vecCol)))
      .filter(col("__q").isNotNull)
      .select(col(idCol), size(col(vecCol)).cast("long").as("dims"),
        VectorBinary.packI8Col(col("__q")).as("buf"))
    if (!catalog.exists(name)) {
      catalog.create(name, rows.schema)
      catalog.overwrite(name, rows)
      rows
    } else {
      val stored = catalog.table(name)
      // the disjoint-id contract is ENFORCED, not assumed: re-appending
      // an existing vec_id would silently duplicate the row in the
      // published artifact (and double q192/q193's checksum readback) —
      // loud beats plausible, same posture as the codecs. The overlap
      // probe is a semi-join against the batch's ids: batch-sized, not
      // artifact-sized, on the build side.
      val dup = stored.select(col(idCol))
        .join(rows.select(col(idCol)), Seq(idCol), "left_semi").count()
      require(dup == 0L,
        s"appendVectors: $dup id(s) of the new batch already exist in " +
          s"artifact '$name' — appends must carry disjoint ids")
      val all = stored.unionByName(rows)
      catalog.overwrite(name, all)
      all
    }
  }

  /** [[readVectors]] with the buffer decoded to an `array<int>` of
    * int8 components — the consumer shape for quantized dot products
    * ([[graft.functions.VectorFunctions.dotInt]]).
    */
  def vectorsDecoded(vectors: DataFrame): DataFrame =
    vectors.withColumn("qvec", VectorBinary.unpackI8Col(col("buf")))

  /** SERVE cosine top-k from decoded artifact vectors — the
    * [[graft.similarity.Similarity.quantizedTopK]] kernel minus the
    * quantize step (the artifact already IS the int8 relation):
    * integer dots are exact, so the ranking served from the published
    * bytes must equal the ranking computed from the float originals'
    * quantization — q190's contract, sharing q66's oracle verbatim.
    * Query side broadcast; the corpus scan is the one data-sized pass.
    */
  def servedTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      qvecCol: String, k: Int): DataFrame = {
    import graft.functions.VectorFunctions
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(idCol).as("q_id"), col(qvecCol).as("qq"))
      .withColumn("nq", VectorFunctions.dotInt(col("qq"), col("qq")))
    val c = corpus.select(col(idCol).as("n_id"), col(qvecCol).as("cq"))
      .withColumn("nc", VectorFunctions.dotInt(col("cq"), col("cq")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("qcos").desc, col("n_id").asc)
    c.crossJoin(broadcast(q))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("qcos",
        VectorFunctions.dotInt(col("qq"), col("cq")).cast("double") /
          sqrt((col("nq") * col("nc")).cast("double")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("qcos"), col("rank"))
  }
}
