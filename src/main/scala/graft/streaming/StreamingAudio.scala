package graft.streaming

import scala.collection.mutable.ArrayBuffer

import graft.multimodal.{AudioFp, IncrementalAudio}
import graft.multimodal.IncrementalAudio.AudioIndex
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Structured Streaming front door for the perceptual AUDIO index —
  * the third of the ingest trilogy ([[StreamingLsh]] for text,
  * [[StreamingSemantic]] for embeddings): WAV payloads land as files,
  * each micro-batch is decoded + fingerprinted ONCE (the expensive
  * codec scan happens per clip at ingest, never again) and folds into
  * [[IncrementalAudio]]; per-batch pair outputs are exactly-once, so
  * the accumulated set equals the one-shot banded run under any file
  * batching — the q132 oracle (q129's SQL verbatim) hash-checks that.
  *
  * `foreachBatch` is the right sink shape for the same reason as the
  * siblings: the index is one grown-per-batch RELATION, not per-key
  * state.
  */
object StreamingAudio {

  val PairsSchema: StructType = StructType(Seq(
    StructField("a", LongType), StructField("b", LongType)))

  /** Drain a stream of `(doc_id: long, payload: binary, n_bytes: int)`
    * rows into an incremental audio index; returns the final index and
    * ALL near-pairs discovered across the run. Blocks until the stream
    * terminates (default AvailableNow). `onBatch` runs after each fold
    * (e.g. to publish the 16-bytes-per-clip hash relation).
    */
  def ingest(stream: DataFrame, checkpointDir: String,
      maxHamming: Int = 3, bands: Int = 4,
      trigger: Trigger = Trigger.AvailableNow(),
      onBatch: AudioIndex => Unit = _ => ()): (AudioIndex, DataFrame) = {
    val spark = stream.sparkSession
    @volatile var idx: Option[AudioIndex] = None
    val pairBatches = ArrayBuffer.empty[DataFrame]
    val query = stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        implicit val sp: SparkSession = spark
        import sp.implicits._
        val media = batch
          .select(col("doc_id"), col("payload"), col("n_bytes"))
          .as[AudioFp.AudioMedia]
        val fps = AudioFp.fingerprints(media)
        val (next, newPairs) = idx match {
          case None => IncrementalAudio.build(fps, maxHamming, bands)
          case Some(i) => IncrementalAudio.addBatch(i, fps, maxHamming)
        }
        idx = Some(next)
        pairBatches += newPairs.localCheckpoint()
        onBatch(next)
      }
      .start()
    query.awaitTermination()
    val pairs = pairBatches.reduceOption(_ unionByName _)
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], PairsSchema))
    lazy val emptyIdx = IncrementalAudio.build(
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        StructType(Seq(StructField("id", LongType),
          StructField("afp", LongType)))),
      maxHamming, bands)._1
    (idx.getOrElse(emptyIdx), pairs)
  }
}
