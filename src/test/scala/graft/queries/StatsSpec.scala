package graft.queries

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** q70's exact decimal co-moment statistics vs Spark's built-in
  * streaming-moment aggregates: same values within float tolerance (the
  * built-ins are the idiomatic API; the decimal path exists for
  * bit-exact oracle checking).
  */
class StatsSpec extends SparkSpec {

  test("decimal co-moment corr/cov/stddev match the built-in aggregates") {
    val dir = "/root/testdata/sf0.001"
    val exact = graft.SparkEntry.queries("q70_stats_corr")(spark, dir)
      .select("l_returnflag", "corr_qp", "cov_qp", "sd_q", "sd_p")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val builtin = Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c"),
        covar_samp(col("l_quantity"), col("l_extendedprice")).as("cv"),
        stddev_samp(col("l_quantity")).as("sq"),
        stddev_samp(col("l_extendedprice")).as("sp"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(exact.keySet === builtin.keySet && exact.nonEmpty)
    exact.foreach { case (k, (c, cv, sq, sp)) =>
      val (bc, bcv, bsq, bsp) = builtin(k)
      def close(a: Double, b: Double) =
        math.abs(a - b) <= 1e-9 * math.max(1.0, math.max(math.abs(a), math.abs(b)))
      assert(close(c, bc), s"corr $k: $c vs $bc")
      assert(close(cv, bcv), s"cov $k: $cv vs $bcv")
      assert(close(sq, bsq), s"sd_q $k: $sq vs $bsq")
      assert(close(sp, bsp), s"sd_p $k: $sp vs $bsp")
    }
  }
}
