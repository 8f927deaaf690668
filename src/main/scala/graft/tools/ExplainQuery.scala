package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dump the formatted physical plan of a named SparkEntry query:
  * `sbt "runMain graft.tools.ExplainQuery q13_scd_merge [sfDir]"`.
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q13_scd_merge")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries(name)(spark, dir).explain("formatted")
    spark.stop()
  }
}
