package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable histogram sketch for quantiles — the quantile sibling of
  * [[graft.functions.KmvSketch]] (distinct counts): per-group
  * fixed-width integer histograms whose partials ADD, so per-fine-group
  * sketches persist once and roll up to any coarser grouping without
  * re-scanning raw data — the q77/q80 maintenance pattern applied to
  * distribution stats (doc-length percentiles per source, latency
  * percentiles per day, ...).
  *
  * Portability: the bin is one truncating division of a nonnegative
  * integer (Spark `div` == DuckDB `//`), counts are exact BIGINTs, and
  * a quantile estimate is "the lower edge of the smallest bin whose
  * cumulative count reaches ceil(q·n)" with q carried as a RATIONAL
  * (num/den) — `cum * den >= num * n` in integers, no double ever —
  * so the whole pipeline replays bit-identically in the oracle. The
  * estimate is exact to `binWidth` by construction.
  *
  * Scale shape: partials are one map-side-combinable groupBy (sketch
  * size per group is bounded by the value range / binWidth, not the
  * row count); merge-up is a sum over partials; quantile extraction
  * windows over per-group SKETCH rows (bin counts), never data rows.
  */
object HistSketch {

  /** One (groupCols..., bin, cnt) row per occupied bin —
    * `bin = value div binWidth`. `valueCol` must be a nonnegative
    * integer column (truncating div == floor only then; enforced).
    */
  def partials(df: DataFrame, groupCols: Seq[String], valueCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    val neg = s"$valueCol must be nonnegative for portable binning"
    df.withColumn("__hv",
        when(col(valueCol) < 0, raise_error(lit(neg)).cast("long"))
          .otherwise(col(valueCol).cast("long")))
      .groupBy((groupCols.map(col) :+
        expr(s"__hv div $binWidth").as("bin")): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Roll partials up to a coarser grouping (pure addition — the
    * sketch-merge contract: merged partials == a direct build).
    */
  def mergeUp(parts: DataFrame, coarserGroupCols: Seq[String]): DataFrame =
    parts.groupBy((coarserGroupCols.map(col) :+ col("bin")): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Per-group quantile estimates from a partial relation: one
    * (groupCols..., level, est) row per requested level, where `est`
    * is the lower edge (`bin * binWidth`) of the smallest bin whose
    * cumulative count reaches ceil(q·n), q = num/den.
    */
  def quantiles(parts: DataFrame, groupCols: Seq[String], binWidth: Long,
      levels: Seq[(String, Long, Long)]): DataFrame = {
    val spark = parts.sparkSession
    import spark.implicits._
    val h = parts.groupBy((groupCols.map(col) :+ col("bin")): _*)
      .agg(sum(col("cnt")).as("cnt")) // idempotent re-merge
    val keys = groupCols.map(col)
    val totals = h.groupBy(keys: _*).agg(sum(col("cnt")).as("n"))
    val cum = h.withColumn("cum", sum(col("cnt")).over(
      Window.partitionBy(keys: _*).orderBy(col("bin"))))
    val lv = levels.toDF("level", "num", "den")
    cum.join(totals, groupCols)
      .crossJoin(broadcast(lv))
      .filter(col("cum") * col("den") >= col("num") * col("n"))
      .groupBy((keys :+ col("level")): _*)
      .agg((min(col("bin")) * binWidth).as("est"))
  }
}
