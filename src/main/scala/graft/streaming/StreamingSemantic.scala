package graft.streaming

import scala.collection.mutable.ArrayBuffer

import graft.similarity.{IncrementalSemantic, SemanticIndex}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** [[StreamingLsh]]'s continuous-ingest shape applied to the EMBEDDING
  * index: a stream of (id, vector) rows drains through `foreachBatch`,
  * each micro-batch folding into [[IncrementalSemantic]] — only the
  * batch is assigned to the stored centroids, candidates come from
  * new-vs-(stored+new) bucket collisions, and per-batch pair outputs
  * are exactly-once, so the accumulated pair set equals a one-shot run
  * against the same centroids under ANY micro-batch partitioning.
  *
  * Unlike the text index, the semantic index has a TRAINED component
  * (the coarse centroids), so ingest starts from an explicit `init`
  * index built on a seed corpus ([[IncrementalSemantic.build]]) rather
  * than training on whichever file the stream happens to list first —
  * that keeps the result independent of file arrival order, which is
  * exactly the production shape (train on the existing corpus, stream
  * the growth) and what makes the q119 oracle (q111's one-shot replay)
  * a batching-independent contract.
  */
object StreamingSemantic {

  val PairsSchema: StructType = StructType(Seq(
    StructField("a", LongType), StructField("b", LongType)))

  /** Drain `stream` (columns `idCol`, `vecCol`) into `init` and return
    * the grown index plus ALL near-dup pairs discovered across the run
    * (pairs with at least one streamed member; seed-corpus-internal
    * pairs were returned by the `build` that made `init`). Blocks until
    * the stream terminates — the default `AvailableNow` trigger
    * processes everything currently available, then stops. `onBatch`
    * runs after each fold with the grown index (e.g. to
    * [[IncrementalSemantic.save]] it to a catalog).
    */
  def ingest(stream: DataFrame, idCol: String, vecCol: String,
      checkpointDir: String, init: SemanticIndex, threshold: Double,
      trigger: Trigger = Trigger.AvailableNow(),
      onBatch: SemanticIndex => Unit = _ => ()): (SemanticIndex, DataFrame) = {
    val spark = stream.sparkSession
    @volatile var idx: SemanticIndex = init
    val pairBatches = ArrayBuffer.empty[DataFrame]
    val query = stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val (next, newPairs) = IncrementalSemantic.addBatch(idx,
          batch.select(col(idCol), col(vecCol)), idCol, vecCol, threshold)
        idx = next
        // a foreachBatch frame is only valid during its micro-batch;
        // the index relations are already materialized by addBatch
        pairBatches += newPairs.localCheckpoint()
        onBatch(next)
      }
      .start()
    query.awaitTermination()
    val pairs = pairBatches.reduceOption(_ unionByName _)
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], PairsSchema))
    (idx, pairs)
  }
}
