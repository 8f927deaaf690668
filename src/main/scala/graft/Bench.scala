package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen warmup so the first measured query doesn't absorb
    // session bring-up (~4s of JVM compile on a cold driver)
    spark.range(1000000).selectExpr("sum(id)").collect()
    try SparkEntry.queries.head._2(spark, sfDir).count()
    catch { case _: Throwable => () }
    // best-of-3 per query: damps scheduler/GC noise without hiding
    // systematic cost (container CPU noise is +/-40% on this box)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to 3).flatMap { i =>
        val t0 = System.nanoTime()
        try {
          // noop sink, not count(): count lets Catalyst prune unused
          // projections and eliminate unique-keyed outer joins (and
          // the windows feeding them), under-timing any query whose
          // expensive columns a count doesn't need
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            // a failed run contributes NO timing (its time-to-failure
            // would otherwise masquerade as a fast success)
            System.err.println(s"[bench] $name run $i FAILED: ${e.getMessage}")
            None
        }
      }
      // -1 is the explicit all-runs-failed marker in the emitted JSON
      name -> (if (times.nonEmpty) times.min else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // total = successful queries only; -1 markers would otherwise SUBTRACT
    // from the headline. failed count keeps the total honest.
    val total = results.map(_._2).filter(_ >= 0).sum
    val failed = results.count(_._2 < 0)
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // stdout tails get truncated in driver logs; keep a self-contained
    // record of the full per-query line next to the repo history
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_LAST.json"), line + "\n")
    spark.stop()
  }
}
