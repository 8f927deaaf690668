package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Best-of-3 timing for a subset of declared queries — the iteration
  * loop for perf work without paying the full Bench sweep:
  * `sbt "runMain graft.tools.BenchSome q46_pipeline q76_recursive_cte [--sf /root/testdata/sf0.1]"`.
  * Same session shape and protocol as [[graft.Bench]].
  */
object BenchSome {
  def main(args: Array[String]): Unit = {
    val (flags, names0) = args.partition(_.startsWith("--sf="))
    val dir = flags.headOption.map(_.stripPrefix("--sf="))
      .getOrElse("/root/testdata/sf0.1")
    val names = if (names0.nonEmpty) names0.toSeq else Seq("q46_pipeline")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-24s best=${times.min}%6.3f  runs=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
