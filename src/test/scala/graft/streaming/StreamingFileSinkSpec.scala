package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Checkpointed parquet file sink: stop/restart resumes from the
  * checkpoint without duplicating or losing rows — the exactly-once
  * contract a 100 TB ingestion pipeline leans on (the file sink commits
  * via the checkpoint's transaction log, not by directory listing).
  */
class StreamingFileSinkSpec extends SparkSpec {

  test("restart from checkpoint is exactly-once") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val out = Files.createTempDirectory("graft-sink-out").toString
    val ckpt = Files.createTempDirectory("graft-sink-ckpt").toString

    val s1 = MemoryStream[Long]
    val q1 = s1.toDF().writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", ckpt)
      .format("parquet").start(out)
    s1.addData(1L to 100L: _*)
    q1.processAllAvailable()
    q1.stop()
    assert(spark.read.parquet(out).count() === 100)

    // new source+query, same checkpoint: replays nothing, appends new data
    val s2 = MemoryStream[Long]
    s2.addData(1L to 100L: _*)   // batch 0 replayed INTO THE SOURCE, but
                                 // the sink's log knows batch 0 committed
    val q2 = s2.toDF().writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", ckpt)
      .format("parquet").start(out)
    s2.addData(101L to 150L: _*)
    q2.processAllAvailable()
    q2.stop()

    val vals = spark.read.parquet(out).as[Long].collect().sorted
    assert(vals.length === vals.distinct.length, "duplicated rows after restart")
    assert(vals.toSet === (1L to 150L).toSet)
  }
}
