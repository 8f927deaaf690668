package graft.streaming

import graft.SparkSpec
import graft.dedup.{Dedup, IncrementalLsh, LshIndex}
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming near-dup ingestion: a real Structured Streaming query
  * (MemoryStream source, foreachBatch sink) folds each micro-batch
  * into the incremental LSH index; the accumulated pair set must equal
  * the one-shot batch run over the same corpus — the batch/streaming
  * consistency contract, same as StreamingScdSpec's for the merge.
  */
/** Top-level so Spark can instantiate the encoder without an outer
  * scope (`as[Doc]` deserializes collected rows back to case objects).
  */
case class LshDoc(doc_id: Long, text: String)

class StreamingLshSpec extends SparkSpec {

  test("streamed ingestion reproduces the one-shot near-dup pair set") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val base = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val corpus = base.unionByName(base.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    val docs = corpus.as[LshDoc].collect()

    val source = MemoryStream[LshDoc]
    @volatile var idx: Option[LshIndex] = None
    @volatile var pairs = Set.empty[(Long, Long)]
    val query = source.toDF().writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = batch.select(col("doc_id"), col("text"))
        val (next, newPairs) = idx match {
          case None    => IncrementalLsh.build(b, "doc_id", "text")
          case Some(i) => IncrementalLsh.addBatch(i, b, "doc_id", "text")
        }
        idx = Some(next)
        pairs ++= newPairs.select("a", "b").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
      }
      .start()
    try {
      val (b1, rest) = docs.partition(_.doc_id % 3 == 0)
      val (b2, b3) = rest.partition(_.doc_id % 3 == 1)
      source.addData(b1.toSeq); query.processAllAvailable()
      source.addData(b2.toSeq); query.processAllAvailable()
      source.addData(b3.toSeq); query.processAllAvailable()
    } finally query.stop()

    val oneShot = Dedup.minhashNearDuplicates(corpus, "doc_id", "text",
        persistShingles = false)
      .select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == oneShot)
    assert(pairs.nonEmpty, "planted duplicates must surface")
  }
}
