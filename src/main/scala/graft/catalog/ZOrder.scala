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
  * Normalization: each column is min-max scaled to a per-dimension bit
  * rank (the min/max come from one tiny aggregate over the input — two
  * scalars per column on the driver, not a collect of data). NULL scales
  * to rank 0, so null rows cluster at the curve origin instead of
  * erroring. Bits/dim is min(16, 63/k) — 16 for up to 3 dims, 15 for 4 —
  * so the top interleaved bit never reaches the long sign bit (a signed
  * z-value would range-partition high-rank rows to the wrong curve end).
  */
object ZOrder {

  /** Rank bits per dimension: k * bits must stay <= 63. */
  private[catalog] def bitsPerDim(k: Int): Int = math.min(16, 63 / k)

  /** Morton interleave of pre-scaled ranks: bit `i` of dimension `j`
    * lands at z-bit `i * k + j`. Pure integer Column arithmetic —
    * constant-folded into whole-stage codegen, no UDF.
    */
  private[catalog] def interleave(ranks: Seq[Column]): Column = {
    val k = ranks.size
    (0 until bitsPerDim(k)).flatMap { i =>
      ranks.zipWithIndex.map { case (r, j) =>
        shiftright(r, i).bitwiseAND(lit(1)).cast("long") *
          lit(1L << (i * k + j))
      }
    }.reduce(_ + _)
  }

  /** `bits`-bit min-max rank of `c` given the column's global [mn, mx]. */
  private[catalog] def rankN(c: Column, mn: Double, mx: Double,
      bits: Int): Column = {
    val top = (1 << bits) - 1
    val range = if (mx > mn) mx - mn else 1.0
    least(lit(top), greatest(lit(0),
      ((c.cast("double") - lit(mn)) / lit(range) * lit(top.toDouble))
        .cast("int")))
  }

  /** Cluster `df` on the z-order curve over `colNames`: range-partition
    * into `numPartitions` output slices by z-value and sort each slice by
    * it. The returned DataFrame is write-ready; the helper column is
    * dropped (projection after the sort keeps the per-partition order).
    */
  def cluster(df: DataFrame, colNames: Seq[String],
      numPartitions: Int): DataFrame = {
    require(colNames.nonEmpty && colNames.size <= 4,
      "1-4 z-order columns (<= 63 interleaved bits in a long)")
    val aggs = colNames.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"__mn_$c"),
      max(col(c).cast("double")).as(s"__mx_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    // empty input / all-NULL column -> null min/max -> rank everything 0
    def stat(i: Int): Double = if (row.isNullAt(i)) 0.0 else row.getDouble(i)
    val bits = bitsPerDim(colNames.size)
    val ranks = colNames.zipWithIndex.map { case (c, i) =>
      rankN(col(c), stat(2 * i), stat(2 * i + 1), bits)
    }
    df.withColumn("__z", interleave(ranks))
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
