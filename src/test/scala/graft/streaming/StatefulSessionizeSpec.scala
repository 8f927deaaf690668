package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import StatefulSessionize._

class StatefulSessionizeSpec extends SparkSpec {

  val M = 60L * 1000000 // one minute in us

  test("keyed state closes sessions across micro-batches") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val source = MemoryStream[Event]
    val q = sessions(source.toDS(), gapUs = 30 * M)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      // batch 0: u1 has two close events; u2 one
      source.addData(
        Event(1, 10, 0 * M, 1.0), Event(1, 11, 5 * M, 2.0),
        Event(2, 20, 0 * M, 5.0))
      q.processAllAvailable()
      assert(spark.table("sess_out").count() === 0) // all sessions open

      // batch 1: u1 jumps 90min -> closes session 1 (2 events, 5min span)
      source.addData(Event(1, 12, 95 * M, 3.0))
      q.processAllAvailable()
      val s1 = spark.table("sess_out").as[SessionOut].collect()
      assert(s1.toSet === Set(SessionOut(1, 1, 2, 5 * M, 10, 3.0)))

      // batch 2: same-batch gap: u2 sends one close then one far event
      source.addData(Event(2, 21, 10 * M, 1.0), Event(2, 22, 200 * M, 9.0))
      q.processAllAvailable()
      val s2 = spark.table("sess_out").as[SessionOut].collect()
      assert(s2.toSet === Set(
        SessionOut(1, 1, 2, 5 * M, 10, 3.0),
        SessionOut(2, 1, 2, 10 * M, 20, 6.0)))

      // batch 3: out-of-order INSIDE a batch still folds correctly
      source.addData(Event(3, 32, 50 * M, 2.0), Event(3, 31, 45 * M, 1.0),
        Event(3, 33, 300 * M, 7.0))
      q.processAllAvailable()
      val s3 = spark.table("sess_out").as[SessionOut].collect()
        .filter(_.user_id == 3)
      assert(s3.toSet === Set(SessionOut(3, 1, 2, 5 * M, 31, 3.0)))
    } finally q.stop()
  }

  test("open-session state survives a query restart from checkpoint") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sess-ck").toString
    val out = java.nio.file.Files.createTempDirectory("graft-sess-out").toString
    val source = MemoryStream[Event]
    def start() = sessions(source.toDS(), gapUs = 30 * M)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("parquet").start(out)

    val q1 = start()
    try {
      source.addData(Event(7, 70, 0 * M, 1.0), Event(7, 71, 5 * M, 2.0))
      q1.processAllAvailable() // session open, held in state
    } finally q1.stop()

    val q2 = start() // recovers offsets AND keyed state from the checkpoint
    try {
      source.addData(Event(7, 72, 95 * M, 3.0)) // gap closes the session
      q2.processAllAvailable()
      val got = spark.read.parquet(out).as[SessionOut].collect().toSet
      // the closed session spans BOTH sides of the restart: 2 events and
      // the 5-minute duration came from the pre-restart state
      assert(got === Set(SessionOut(7, 1, 2, 5 * M, 70, 3.0)))
    } finally q2.stop()
  }
}
