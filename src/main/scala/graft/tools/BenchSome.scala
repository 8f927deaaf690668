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
    val spark = SparkEntry.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same tail-buffer hygiene as Bench (trivially-true-equals WARN)
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.Column", org.apache.logging.log4j.Level.ERROR)
    spark.range(1000000).selectExpr("sum(id)").collect()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warmup run (uncounted), then best-of-3 per action — the same
      // protocol as Bench, for like-for-like A/B against BENCH_r{N}
      fn(spark, dir).count()
      def bo3(action: org.apache.spark.sql.DataFrame => Unit): Seq[Double] =
        (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          action(fn(spark, dir))
          (System.nanoTime() - t0) / 1e9
        }
      val counts = bo3(_.count(): Unit)
      val noops = bo3(_.write.format("noop").mode("overwrite").save())
      println(f"$name%-28s count_best=${counts.min}%6.3f noop_best=${noops.min}%6.3f  " +
        f"count=${counts.map(t => f"$t%.3f").mkString(",")} noop=${noops.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
