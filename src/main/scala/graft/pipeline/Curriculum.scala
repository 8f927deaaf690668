package graft.pipeline

import graft.text.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CURRICULUM schedule — the easy-first training order (Bengio et al.
  * 2009): documents band by a difficulty proxy (the corpus quality
  * score — clean, fluent text first), early epochs admit only the top
  * bands, and the admission floor ramps linearly down until the final
  * epoch trains on everything. Within the ramp, each epoch orders its
  * admitted docs band-by-band (cleanest first) with a seeded
  * deterministic shuffle inside each band — i.i.d. WITHIN a band, so
  * the schedule is a curriculum, not a sort by accident of ids.
  *
  * Everything is exact arithmetic on engine-identical quantities: the
  * quality score is the q46 double (identical IEEE ops both engines),
  * banding is `floor(q·bands)` clamped, the admission floor is integer
  * `div`, the shuffle key is the q103 salted md5, and the global order
  * is [[graft.operators.Ranking.globalRowNumber]] — a two-phase rank,
  * never a single-partition sort. Replays bit-identically (q168).
  */
object Curriculum {

  /** One row per (epoch, admitted doc): `(epoch, idCol, band, ord)`
    * where `ord` is the GLOBAL schedule position (dense from 1 across
    * all epochs, epochs in order). Epoch `e`'s admission floor is
    * `(bands−1)·(epochs−1−e) div (epochs−1)` — top band only at epoch
    * 0, everything at the last epoch.
    */
  def schedule(docs: DataFrame, idCol: String, textCol: String,
      epochs: Int = 3, bands: Int = 5,
      stopwords: Seq[String] = CorpusPipeline.Config().stopwords)
      : DataFrame = {
    require(epochs > 0 && bands > 1, "need epochs > 0 and bands > 1")
    val id = col(idCol)
    val spark = docs.sparkSession
    val scored = docs.select(id,
        TextAnalysis.qualityScore(col(textCol), stopwords).as("quality"))
      .withColumn("band", least(lit(bands - 1L),
        floor(col("quality") * bands).cast("long")))
    val eps = broadcast(spark.range(epochs)
      .select(col("id").cast("int").as("epoch")))
    val denom = math.max(1, epochs - 1)
    val admitted = scored.crossJoin(eps)
      .withColumn("minband", expr(
        s"(${bands - 1}L * (${epochs - 1}L - epoch)) div ${denom}L"))
      .filter(col("band") >= col("minband"))
      .withColumn("bandrev", lit(bands - 1L) - col("band"))
      .withColumn("k", graft.functions.PortableHash.hash60Base(
        concat_ws(":", col("epoch"), id)))
    graft.operators.Ranking.globalRowNumber(admitted,
        Seq("epoch", "bandrev", "k", idCol), "ord")
      .select(col("epoch"), id, col("band"), col("ord"))
  }
}
