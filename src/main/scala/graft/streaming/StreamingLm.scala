package graft.streaming

import graft.text.Repetition
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Streaming door for the reference-LM COUNT STORE ([[Repetition
  * .fitBackoff]]): the reference corpus lands as files and each
  * micro-batch's trigram/bigram/unigram counts fold into the
  * accumulated store — counts are per-doc quantities, so the merged
  * store over ANY batching equals the one-shot fit, and scoring
  * against it equals the one-shot [[Repetition.backoffScore]] (q167's
  * oracle is q160's SQL verbatim). Each fold is localCheckpoint-
  * materialized (the iterative-plan loop invariant).
  */
object StreamingLm {

  /** Drain `stream` (columns `idCol`, `textCol`), folding each
    * micro-batch into the accumulated count store. Returns the merged
    * store (empty stream → empty store). Blocks until termination.
    */
  def ingest(stream: DataFrame, idCol: String, textCol: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): Repetition.LmCounts = {
    val spark = stream.sparkSession
    @volatile var acc: Option[Repetition.LmCounts] = None
    val query = stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val c = Repetition.fitBackoffMaterialized(batch, idCol, textCol)
        acc = Some(acc.map(_.merge(c).checkpointed()).getOrElse(c))
        ()
      }
      .start()
    query.awaitTermination()
    acc.getOrElse {
      val empty = emptyLike(spark,
        StructType(Seq(stream.schema(idCol), stream.schema(textCol))))
      Repetition.fitBackoff(empty, idCol, textCol)
    }
  }

  private def emptyLike(spark: SparkSession,
      schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
}
