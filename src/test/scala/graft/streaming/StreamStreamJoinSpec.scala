package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Watermarked stream-stream inner join — the remaining Structured
  * Streaming surface next to windowed aggs, dedupe, keyed state and
  * foreachBatch SCD: clicks joined to impressions within a bounded
  * event-time interval, state expired by watermark on BOTH sides.
  */
class StreamStreamJoinSpec extends SparkSpec {

  case class Imp(ad_id: Long, imp_ts: Timestamp)
  case class Click(ad_id: Long, click_ts: Timestamp)

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("interval-bounded join emits matches and expires state by watermark") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val imps = MemoryStream[Imp]
    val clicks = MemoryStream[Click]

    val joined = imps.toDF().withWatermark("imp_ts", "10 minutes")
      .join(
        clicks.toDF().withColumnRenamed("ad_id", "c_ad_id")
          .withWatermark("click_ts", "10 minutes"),
        expr("""ad_id = c_ad_id AND
                click_ts >= imp_ts AND
                click_ts <= imp_ts + INTERVAL 15 MINUTES"""))

    val q = joined.writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName("ss_join")
      .start()
    try {
      imps.addData(
        Imp(1L, ts("2024-01-01 10:00:00")),
        Imp(2L, ts("2024-01-01 10:01:00")))
      clicks.addData(
        Click(1L, ts("2024-01-01 10:05:00")), // within 15 min -> match
        Click(2L, ts("2024-01-01 10:30:00"))) // 29 min after -> no match
      q.processAllAvailable()
      val got = spark.table("ss_join")
        .select(col("ad_id"), col("click_ts").cast("string"))
        .as[(Long, String)].collect().toSet
      assert(got === Set((1L, "2024-01-01 10:05:00")))

      // push watermark far ahead; late impression for ad 3 then arrives
      // below the watermark and its would-be click state is gone
      imps.addData(Imp(99L, ts("2024-01-01 12:00:00")))
      clicks.addData(Click(99L, ts("2024-01-01 12:01:00")))
      q.processAllAvailable()
      imps.addData(Imp(3L, ts("2024-01-01 10:02:00"))) // late, below WM
      clicks.addData(Click(3L, ts("2024-01-01 10:03:00")))
      q.processAllAvailable()
      val ids = spark.table("ss_join").select("ad_id")
        .as[Long].collect().toSet
      assert(ids === Set(1L, 99L), s"late rows must not join: $ids")
    } finally q.stop()
  }
}
