package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Watermarked tumbling-window aggregation over a real streaming query —
  * the readStream shape of q26 with late-data semantics.
  */
class StreamingWindowSpec extends SparkSpec {

  case class Ev(ts: Timestamp, event_type: String, value: Double)

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("watermark closes hour windows in append mode; late rows drop") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val source = MemoryStream[Ev]
    val agg = source.toDF()
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
    val q = agg.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName("win_out")
      .start()
    try {
      source.addData(
        Ev(ts("2024-01-01 10:05:00"), "a", 1.0),
        Ev(ts("2024-01-01 10:45:00"), "a", 2.0),
        Ev(ts("2024-01-01 11:10:00"), "b", 5.0))
      q.processAllAvailable()
      // watermark = 11:10 - 30min = 10:40 < 11:00 -> hour 10 not yet final
      assert(spark.table("win_out").count() === 0)

      // advance event time past 12:00: hour-10 and hour-11 windows close
      source.addData(Ev(ts("2024-01-01 12:40:00"), "b", 7.0))
      q.processAllAvailable()
      val closed = spark.table("win_out")
        .select(col("window.start").cast("string"), col("event_type"),
          col("n"), col("v"))
        .as[(String, String, Long, Double)].collect().toSet
      assert(closed === Set(
        ("2024-01-01 10:00:00", "a", 2L, 3.0),
        ("2024-01-01 11:00:00", "b", 1L, 5.0)))

      // a row behind the watermark (10:30 < 12:10) must be dropped
      source.addData(Ev(ts("2024-01-01 10:30:00"), "a", 100.0))
      source.addData(Ev(ts("2024-01-01 14:00:00"), "c", 1.0))
      q.processAllAvailable()
      val after = spark.table("win_out")
        .filter(col("event_type") === "a")
        .agg(sum("v")).head.getDouble(0)
      assert(after === 3.0) // late 100.0 never appears
    } finally q.stop()
  }

  test("session_window merges gap-bounded activity per key in append mode") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val source = MemoryStream[Ev]
    // built-in session windows (dynamic, gap-merged) — the declarative
    // sibling of the custom flatMapGroupsWithState sessionizer
    val agg = source.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
    val q = agg.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName("sess_out")
      .start()
    try {
      // two bursts for 'a' separated by > 30 min -> two sessions;
      // the middle event extends the first session (gap < 30 min)
      source.addData(
        Ev(ts("2024-01-01 09:00:00"), "a", 1.0),
        Ev(ts("2024-01-01 09:20:00"), "a", 2.0),
        Ev(ts("2024-01-01 10:30:00"), "a", 4.0))
      q.processAllAvailable()
      // advance the watermark far enough to close both sessions
      source.addData(Ev(ts("2024-01-01 13:00:00"), "z", 0.0))
      q.processAllAvailable()
      val sessions = spark.table("sess_out")
        .filter(col("event_type") === "a")
        .select(col("session_window.start").cast("string"),
          col("session_window.end").cast("string"), col("n"), col("v"))
        .as[(String, String, Long, Double)].collect().toSet
      assert(sessions === Set(
        // session end = last event + gap
        ("2024-01-01 09:00:00", "2024-01-01 09:50:00", 2L, 3.0),
        ("2024-01-01 10:30:00", "2024-01-01 11:00:00", 1L, 4.0)))
    } finally q.stop()
  }
}
