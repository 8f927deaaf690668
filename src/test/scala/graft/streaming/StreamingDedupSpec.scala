package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming exact dedup: `dropDuplicates` under a watermark keeps
  * bounded state (keys older than the watermark age out) while dropping
  * replays inside the window — the streaming face of q18's exact dedup.
  */
class StreamingDedupSpec extends SparkSpec {

  case class Doc(doc_id: Long, fp: String, ts: Timestamp)
  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("watermarked dropDuplicates removes replays within the window") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val source = MemoryStream[Doc]
    val q = source.toDF()
      .withWatermark("ts", "1 hour")
      .dropDuplicates("fp")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      source.addData(
        Doc(1, "aaa", ts("2024-01-01 10:00:00")),
        Doc(2, "bbb", ts("2024-01-01 10:05:00")),
        Doc(3, "aaa", ts("2024-01-01 10:10:00"))) // replay of fp=aaa
      q.processAllAvailable()
      source.addData(Doc(4, "aaa", ts("2024-01-01 10:20:00"))) // replay
      q.processAllAvailable()
      val ids = spark.table("dedup_out")
        .select("doc_id").as[Long].collect().toSet
      assert(ids === Set(1L, 2L)) // one survivor per fingerprint
    } finally q.stop()
  }
}
