package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-7 diagnosis harness for the q112 phase-divergence failure at
  * sf0.1: runs the stacked-prefix-sum manifest under a given set of
  * session confs and reports pass/fail, so the guard's trigger can be
  * attributed (AQE stage cache vs exchange reuse vs plan shape).
  */
object TwoPhaseProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val confs: Seq[(String, Map[String, String])] = Seq(
      "default" -> Map(),
      "no-aqe" -> Map("spark.sql.adaptive.enabled" -> "false"),
      "no-reuse" -> Map("spark.sql.exchange.reuse" -> "false"))
    confs.foreach { case (tag, cs) =>
      val b = SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
      cs.foreach { case (k, v) => b.config(k, v) }
      val spark = b.getOrCreate()
      cs.foreach { case (k, v) => spark.conf.set(k, v) }
      spark.sparkContext.setLogLevel("ERROR")
      val r =
        try {
          val n = graft.queries.Round7Queries
            .queries("q112_epoch_shard_manifest")(spark, dir).count()
          s"OK rows=$n"
        } catch { case e: Throwable =>
          "FAIL " + Option(e.getMessage).getOrElse("").take(120)
        }
      println(s"[probe] $tag -> $r")
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
