package graft.streaming

import scala.collection.mutable.ArrayBuffer

import graft.quality.Drift
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Streaming door for the per-source DRIFT monitor: the CURRENT
  * snapshot lands as files and each micro-batch reduces to its
  * (source, bucket) partial histogram in the foreachBatch frame —
  * histogram counts are per-occurrence quantities (the [[Drift
  * .bucketCounts]] mergeable-partials contract), so the accumulated
  * sum over ANY file batching equals the one-shot histogram, and the
  * end-of-stream report against the frozen BASELINE histogram equals
  * the one-shot [[Drift.sourceDrift]] — q164's oracle is q163's SQL
  * verbatim under a different batching.
  *
  * At 100 TB this is the monitor's deployment shape: the baseline
  * histogram is `sources × dim` rows computed once per release; each
  * landing batch pays one tokenize scan; drift is re-reportable at any
  * point from state that never exceeds `sources × dim` rows.
  */
object StreamingDrift {

  /** Drain `stream` (columns `idCol`, `srcCol`, `textCol`), folding
    * each micro-batch into the accumulated (source, bucket, n)
    * histogram. Returns the merged histogram relation (empty stream →
    * empty relation). Blocks until the stream terminates.
    */
  def ingest(stream: DataFrame, idCol: String, srcCol: String,
      textCol: String, checkpointDir: String, dim: Int = 256,
      trigger: Trigger = Trigger.AvailableNow()): DataFrame = {
    val spark = stream.sparkSession
    val batches = ArrayBuffer.empty[DataFrame]
    val query = stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batches += Drift.bucketCounts(batch, idCol, srcCol, textCol, dim)
          .localCheckpoint()
        ()
      }
      .start()
    query.awaitTermination()
    val schema = StructType(Seq(stream.schema(srcCol),
      StructField("bucket", LongType), StructField("n", LongType)))
    batches.reduceOption(_ unionByName _)
      .map(_.groupBy(col(srcCol), col("bucket"))
        .agg(sum(col("n")).as("n")))
      .getOrElse(
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema))
  }
}
