package graft.streaming

import graft.SparkSpec
import graft.functions.{KmvSketch, PortableHash}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** The KMV sketch as STREAMING state: a typed-Aggregator UDAF inside a
  * streaming groupBy keeps its bounded k-long buffer in the state store
  * and absorbs every micro-batch incrementally — the order-insensitive
  * merge algebra (KmvSketchSpec) is exactly what makes the running
  * estimate equal a batch recompute over everything seen, replay split
  * notwithstanding.
  */
object StreamingSketchSpec {
  case class U(event_type: String, user_id: Long)
}

class StreamingSketchSpec extends SparkSpec {
  import StreamingSketchSpec.U

  test("streaming KMV estimate equals the batch estimate over all batches") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val source = MemoryStream[U]
    def est(c: org.apache.spark.sql.Column) =
      KmvSketch.kmvEstimate(PortableHash.hash60Base(c.cast("string")), 64)
    val q = source.toDF()
      .groupBy(col("event_type"))
      .agg(est(col("user_id")).as("approx_users"))
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("kmv_stream")
      .start()
    try {
      val b1 = (0L until 1000L).map(U("a", _)) ++ (0L until 30L).map(U("b", _))
      val b2 = (500L until 1500L).map(U("a", _)) ++ (20L until 40L).map(U("b", _))
      source.addData(b1: _*)
      q.processAllAvailable()
      source.addData(b2: _*)
      q.processAllAvailable()
      val streamed = spark.table("kmv_stream")
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val batch = (b1 ++ b2).toDF()
        .groupBy(col("event_type"))
        .agg(est(col("user_id")).as("approx_users"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(streamed === batch) // incremental state == one-shot aggregate
      assert(streamed("b") === 40.0) // below k: exact
      assert(math.abs(streamed("a") - 1500.0) / 1500.0 < 0.3)
    } finally q.stop()
  }
}
