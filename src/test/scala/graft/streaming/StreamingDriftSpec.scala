package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.quality.Drift
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming drift door: folded partial histograms over any file
  * batching must reproduce the one-shot drift report; an empty stream
  * yields an empty histogram.
  */
class StreamingDriftSpec extends SparkSpec {

  private def docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    .select(col("doc_id"), col("source"), col("text"))

  private def rep(df: DataFrame): Set[(String, Long, Long, Long)] =
    df.select(col("source"), col("n_a"), col("n_b"), col("drift"))
      .collect().toSet[org.apache.spark.sql.Row]
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("streamed folding == one-shot drift under two file batchings") {
    val a = docs.filter(expr("(doc_id div 20) % 2") === 0)
    val b = docs.filter(expr("(doc_id div 20) % 2") === 1)
    val oneShot = rep(Drift.sourceDrift(a, b, "doc_id", "source", "text"))
    assert(oneShot.nonEmpty)
    val base = Drift.bucketCounts(a, "doc_id", "source", "text")
      .localCheckpoint()
    def streamed(nFiles: Int): Set[(String, Long, Long, Long)] = {
      val stage = Files.createTempDirectory("graft-sd-landing").toString
      val cp = Files.createTempDirectory("graft-sd-cp").toString
      b.repartition(nFiles, col("doc_id"))
        .write.mode("overwrite").parquet(stage)
      val stream = spark.readStream
        .schema(spark.read.parquet(stage).schema)
        .option("maxFilesPerTrigger", 1).parquet(stage)
      val cur = StreamingDrift.ingest(stream, "doc_id", "source",
        "text", cp)
      rep(Drift.fromCounts(base, cur, "source"))
    }
    assert(streamed(3) == oneShot)
    assert(streamed(2) == oneShot)
  }

  test("empty stream yields an empty histogram") {
    val stage = Files.createTempDirectory("graft-sd-empty").toString
    val cp = Files.createTempDirectory("graft-sd-empty-cp").toString
    docs.limit(0).write.mode("overwrite").parquet(stage)
    val stream = spark.readStream
      .schema(spark.read.parquet(stage).schema)
      .option("maxFilesPerTrigger", 1).parquet(stage)
    val cur = StreamingDrift.ingest(stream, "doc_id", "source", "text", cp)
    assert(cur.count() == 0)
  }
}
