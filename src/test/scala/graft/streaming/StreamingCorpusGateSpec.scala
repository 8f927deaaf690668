package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.pipeline.Mixture
import graft.text.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The row-local corpus gates (mixture hash-gate, quality score,
  * language ID) are pure projections/filters — they run UNCHANGED on a
  * stream: the ingest-time shape of the cleaning pipeline, where
  * arriving documents are gated before they ever land in the corpus
  * table. (The corpus-wide stages — dedup, LSH — stay batch/periodic;
  * this spec pins the gate stage's batch/stream equivalence.)
  */
class StreamingCorpusGateSpec extends SparkSpec {

  private val stops = Seq("the", "a", "of", "and", "is")

  private def gate(df: DataFrame): DataFrame =
    df.filter(Mixture.keepExpr(col("doc_id"), lit(600000L)))
      .select(col("doc_id"), col("text"),
        TextAnalysis.qualityScore(col("text"), stops).as("quality"),
        TextAnalysis.langId(col("text")).as("lang_pred"))
      .filter(col("quality") >= 0.7 && col("lang_pred") === "en")

  test("streamed gate output equals the batch gate over the same rows") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.001",
        "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

    val src = MemoryStream[(Long, String)]
    val q = gate(src.toDF().toDF("doc_id", "text")).writeStream
      .format("memory").queryName("gated_stream")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-gate-ck").toString)
      .start()
    try {
      // deliver in three micro-batches
      val (b1, rest) = docs.splitAt(docs.size / 3)
      val (b2, b3) = rest.splitAt(rest.size / 2)
      Seq(b1, b2, b3).foreach { b =>
        src.addData(b); q.processAllAvailable()
      }
      val streamed = spark.table("gated_stream")
        .collect().map(r => (r.getLong(0), r.getDouble(2), r.getString(3)))
        .toSet
      val batch = gate(docs.toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getDouble(2), r.getString(3)))
        .toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }
}
