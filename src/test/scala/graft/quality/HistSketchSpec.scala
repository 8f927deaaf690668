package graft.quality

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Histogram-sketch quantiles: the merge contract (fine partials
  * rolled up == direct coarse build), estimate accuracy (within one
  * binWidth of the exact percentile), and layout independence.
  */
class HistSketchSpec extends SparkSpec {

  private val W = 64L
  private val Levels = Seq(("p25", 1L, 4L), ("p50", 1L, 2L),
    ("p90", 9L, 10L), ("p99", 99L, 100L))

  private def docs: DataFrame =
    Tables(spark, "/root/testdata/sf0.001", "documents")
      .withColumn("len", length(col("text")).cast("long"))

  private def collectQ(df: DataFrame): Map[(String, String), Long] =
    df.collect().map(r => ((r.getString(0), r.getString(1)),
      r.getLong(2))).toMap

  test("fine partials merged up == direct coarse build") {
    val fine = HistSketch.partials(docs, Seq("source", "lang"), "len", W)
    val viaMerge = HistSketch.quantiles(
      HistSketch.mergeUp(fine, Seq("source")), Seq("source"), W, Levels)
    val direct = HistSketch.quantiles(
      HistSketch.partials(docs, Seq("source"), "len", W),
      Seq("source"), W, Levels)
    assert(collectQ(viaMerge) == collectQ(direct))
    assert(collectQ(direct).nonEmpty)
  }

  test("estimate is the bin floor of the exact percentile") {
    val est = collectQ(HistSketch.quantiles(
      HistSketch.partials(docs, Seq("source"), "len", W),
      Seq("source"), W, Levels))
    val lens = docs.select(col("source"), col("len")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for { (src, vs) <- lens; (name, num, den) <- Levels } {
      // smallest value at cumulative rank >= ceil(q*n), then bin floor
      val rank = ((num * vs.length + den - 1) / den).toInt
      val exact = vs(math.max(rank, 1) - 1)
      assert(est((src, name)) == exact / W * W,
        s"$src $name: est=${est((src, name))} exact=$exact")
    }
  }

  test("layout-independent") {
    def run(d: DataFrame) = collectQ(HistSketch.quantiles(
      HistSketch.partials(d, Seq("source"), "len", W),
      Seq("source"), W, Levels))
    assert(run(docs) == run(docs.repartition(13)))
  }

  test("negative values refuse loudly") {
    val spark0 = spark
    import spark0.implicits._
    val bad = Seq(("a", 5L), ("a", -1L)).toDF("source", "len")
    val e = intercept[Exception] {
      HistSketch.partials(bad, Seq("source"), "len", W).collect()
    }
    assert(e.getMessage != null)
  }
}
