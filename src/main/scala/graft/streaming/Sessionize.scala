package graft.streaming

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event sessionization: assign events to sessions split on inactivity
  * gaps. Window-function formulation — two per-user windows, both
  * partition-parallel (shuffle key = user), no state store needed for the
  * batch path. The streaming path reuses the same gap semantics via
  * `flatMapGroupsWithState` (see [[StreamingScd]] for the stateful
  * pattern).
  */
object Sessionize {

  /** Per-event session sequence numbers from `gapNs` inactivity splits.
    * `tsCol` must be an integral tick column (any unit; gap in the same unit).
    */
  def assign(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, gapTicks: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val prev = lag(col(tsCol), 1).over(w)
    events
      .withColumn("is_new",
        when(prev.isNull || (col(tsCol) - prev) > gapTicks, 1).otherwise(0))
      .withColumn("session_seq",
        sum(col("is_new"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("is_new")
  }

  /** Session-level rollup: events, span, value total per session. */
  def sessions(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, gapTicks: Long): DataFrame =
    assign(events, userCol, tsCol, tieCol, gapTicks)
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        (max(col(tsCol)) - min(col(tsCol))).as("duration"),
        min(col(tieCol)).as("first_event"))
}
