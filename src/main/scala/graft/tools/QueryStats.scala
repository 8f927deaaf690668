package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import graft.SparkEntry
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Execution-shape probe for a declared query: one warmup, then one
  * measured noop-sink run under a SparkListener, reporting job count,
  * stage count, task count, shuffle read/write bytes and spill — the
  * evidence that matters for ITERATIVE operators (PageRank, CC, BPE
  * training) whose final `explain` is just a localCheckpoint scan.
  * `sbt "runMain graft.tools.QueryStats q208_pagerank [--sf=DIR]"`.
  */
object QueryStats {
  def main(args: Array[String]): Unit = {
    val (flags, names) = args.partition(_.startsWith("--sf="))
    val dir = flags.headOption.map(_.stripPrefix("--sf="))
      .getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, dir).write.format("noop").mode("overwrite").save() // warmup
      val jobs = new AtomicInteger(0)
      val stages = new AtomicInteger(0)
      val tasks = new AtomicInteger(0)
      val shufRead = new AtomicLong(0L)
      val shufWrite = new AtomicLong(0L)
      val spill = new AtomicLong(0L)
      val listener = new SparkListener {
        override def onJobStart(j: SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
        override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet()
          tasks.addAndGet(s.stageInfo.numTasks)
          val m = s.stageInfo.taskMetrics
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          spill.addAndGet(m.diskBytesSpilled)
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      // block until the async listener bus has DELIVERED every queued
      // event (a fixed sleep could drop late events). Caveat: retried
      // stages report their metrics per attempt, so shuffle/spill
      // bytes can overcount under task retries — fine on a healthy
      // local run, where retries are absent.
      org.apache.spark.graft.ListenerBridge.drain(spark.sparkContext)
      spark.sparkContext.removeSparkListener(listener)
      println(f"$name%-28s secs=$secs%7.3f jobs=${jobs.get}%4d " +
        f"stages=${stages.get}%4d tasks=${tasks.get}%5d " +
        f"shuffle_read=${shufRead.get}%10d shuffle_write=${shufWrite.get}%10d " +
        f"spill=${spill.get}%d")
    }
    spark.stop()
  }
}
