package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking — `ROW_NUMBER() OVER (ORDER BY ...)`
  * without the single-partition window Spark plans for a global sort:
  * the same two-phase trick as [[graft.pipeline.Packing]]'s prefix
  * sums, applied to counts.
  *
  *   1. range-partition on the order key — slice ids are then monotone
  *      in the total order — and rank WITHIN each slice (window
  *      partitions are shuffle-slice-sized);
  *   2. aggregate one row-count per slice (a relation the size of the
  *      shuffle partition count), prefix-sum it with a tiny window,
  *      and broadcast the base offsets back: global rank = slice base
  *      + within-slice rank.
  *
  * The order must be TOTAL (include a unique tiebreak column) — with
  * ties the within-slice order, and therefore the assigned ranks,
  * would be nondeterministic. Results are independent of the slicing:
  * any monotone cut of a total order yields the same global ranks.
  */
object Ranking {

  def globalRowNumber(df: DataFrame, order: Seq[Column],
      as: String = "rn"): DataFrame = {
    val sliced = df
      .repartitionByRange(order: _*)
      .withColumn("__rank_cell", spark_partition_id())
    val wCell = Window.partitionBy(col("__rank_cell"))
      .orderBy(order: _*)
    val within = sliced.withColumn("__rank_in", row_number().over(wCell))
    val wOff = Window.orderBy(col("__rank_cell"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val base = within
      .groupBy(col("__rank_cell")).agg(count(lit(1)).as("__rank_n"))
      .select(col("__rank_cell"),
        coalesce(sum(col("__rank_n")).over(wOff), lit(0L)).as("__rank_base"))
    within
      .join(broadcast(base), Seq("__rank_cell"))
      .withColumn(as, col("__rank_base") + col("__rank_in"))
      .drop("__rank_cell", "__rank_in", "__rank_base")
  }
}
