package graft.catalog

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton curve) data clustering — multi-dimensional range
  * pruning for the 100 TB layout story.
  *
  * Hive-style partitioning (`ParquetCatalog.overwrite(partitionBy)`)
  * prunes on ONE low-cardinality column; bucketing co-locates ONE join
  * key. A scan filtered on several range predicates at once — `custkey
  * BETWEEN ... AND totalprice BETWEEN ...` — gets nothing from either.
  * Interleaving the bits of the filter columns into one z-value and
  * range-partitioning + sorting the write by it puts rows that are close
  * in EVERY dimension into the same files, so parquet min/max stats
  * (file- and row-group-level) exclude most files for any of the
  * dimensions. This is the same layout lever as Delta's OPTIMIZE ZORDER
  * BY (public design) — here it composes with any writer: `cluster(df,
  * cols, n)` returns a DataFrame whose partitioning/order encode the
  * curve, and `ParquetCatalog.overwrite` (or a plain parquet write)
  * persists it.
  *
  * Normalization: each column is min-max scaled to a 16-bit rank (the
  * min/max come from one tiny aggregate over the input — two scalars per
  * column on the driver, not a collect of data). NULL scales to rank 0,
  * so null rows cluster at the curve origin instead of erroring.
  * 16 bits/dim keeps the interleaved z-value in a long for up to 4 dims.
  */
object ZOrder {

  private val Bits = 16

  /** Morton interleave of pre-scaled 16-bit ranks: bit `i` of dimension
    * `j` lands at z-bit `i * k + j`. Pure integer Column arithmetic —
    * constant-folded into whole-stage codegen, no UDF.
    */
  private[catalog] def interleave(ranks: Seq[Column]): Column = {
    val k = ranks.size
    (0 until Bits).flatMap { i =>
      ranks.zipWithIndex.map { case (r, j) =>
        shiftright(r, i).bitwiseAND(lit(1)).cast("long") *
          lit(1L << (i * k + j))
      }
    }.reduce(_ + _)
  }

  /** 16-bit min-max rank of `c` given the column's global [mn, mx]. */
  private[catalog] def rank16(c: Column, mn: Double, mx: Double): Column = {
    val range = if (mx > mn) mx - mn else 1.0
    least(lit(65535), greatest(lit(0),
      ((c.cast("double") - lit(mn)) / lit(range) * lit(65535.0)).cast("int")))
  }

  /** Cluster `df` on the z-order curve over `colNames`: range-partition
    * into `numPartitions` output slices by z-value and sort each slice by
    * it. The returned DataFrame is write-ready; the helper column is
    * dropped (projection after the sort keeps the per-partition order).
    */
  def cluster(df: DataFrame, colNames: Seq[String],
      numPartitions: Int): DataFrame = {
    require(colNames.nonEmpty && colNames.size <= 4,
      "1-4 z-order columns (16 bits each in a long)")
    val aggs = colNames.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"__mn_$c"),
      max(col(c).cast("double")).as(s"__mx_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val ranks = colNames.zipWithIndex.map { case (c, i) =>
      rank16(col(c), row.getDouble(2 * i), row.getDouble(2 * i + 1))
    }
    df.withColumn("__z", interleave(ranks))
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
