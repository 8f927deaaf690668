package graft.tools

import graft.SparkEntry
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Per-Spark-job wall-time profile of one warm run of a declared query:
  * `sbt "runMain graft.tools.JobProfile q46_pipeline [sfDir]"` — shows
  * where a multi-job composition (pipeline stages, iterative rounds)
  * actually spends its time.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q46_pipeline")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkEntry.tune(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val fn = SparkEntry.queries(name)
    fn(spark, dir).count() // warm run 1 (populates caches)
    fn(spark, dir).count() // warm run 2
    val starts = mutable.Map[Int, (Long, String)]()
    val rows = mutable.ArrayBuffer[(Int, Double, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts(js.jobId) = (js.time,
          Option(js.properties).map { p =>
            val d = p.getProperty("spark.job.description", "")
            val c = p.getProperty("callSite.short", "")
            if (d.nonEmpty) d else c
          }.getOrElse("") + " | " +
            js.stageInfos.map(_.name).distinct.mkString(";").take(160))
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.get(je.jobId).foreach { case (t0, d) =>
          rows += ((je.jobId, (je.time - t0) / 1e3,
            d.replaceAll("\\s+", " ").take(200)))
        }
    })
    val t0 = System.nanoTime()
    fn(spark, dir).count()
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1000) // let the listener bus drain
    rows.sortBy(_._1).foreach { case (id, s, d) =>
      println(f"job $id%3d  $s%7.3f s  $d")
    }
    println(f"TOTAL $total%.3f s over ${rows.size} jobs (sum ${rows.map(_._2).sum}%.3f)")
    spark.stop()
  }
}
