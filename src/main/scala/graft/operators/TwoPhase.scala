package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The two-phase distributed prefix sum shared by
  * [[graft.pipeline.Packing]] (token offsets) and [[Ranking]] (global
  * row numbers): range-partition on `(part, order)` so slice ids are
  * monotone within each `part` group, prefix-sum WITHIN each slice (a
  * window whose partitions are shuffle-slice-sized, never
  * group-sized), then aggregate one subtotal per `(part, slice)` — a
  * relation the size of the shuffle partition count — prefix it with a
  * tiny window, and broadcast the base offsets back.
  *
  * Correctness requires BOTH consumers of the sliced relation (the
  * per-row prefix and the subtotal aggregate) to see the SAME slicing:
  * range-partitioner bounds are sampled per physical execution, and
  * the two subtrees only coincide because Spark's exchange reuse
  * materializes the range exchange once (`ReusedExchange` in the
  * plan). That is the default; the guard below turns a config that
  * would silently break the invariant into a loud error.
  *
  * The `order` must be TOTAL within each `part` group (include a
  * unique tiebreak) — with ties, within-slice order would be
  * nondeterministic.
  */
object TwoPhase {

  /** Inclusive prefix sum of `value` over the named `order` columns
    * within each named `part` group, as column `as`. With `part`
    * empty: one global sequence. Internal `__tp_*` columns are
    * dropped from the result.
    */
  def prefixSum(df: DataFrame, part: Seq[String], order: Seq[String],
      value: Column, as: String): DataFrame = {
    require(df.sparkSession.conf
        .get("spark.sql.exchange.reuse", "true") != "false",
      "TwoPhase.prefixSum requires spark.sql.exchange.reuse: both " +
        "phases must consume one materialized range exchange")
    val partC = part.map(col)
    val orderC = order.map(col)
    val sliced = df
      .repartitionByRange(partC ++ orderC: _*)
      .withColumn("__tp_cell", spark_partition_id())
    val wCell = Window.partitionBy(partC :+ col("__tp_cell"): _*)
      .orderBy(orderC: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = sliced.withColumn("__tp_in", sum(value).over(wCell))
    val wOff = Window.partitionBy(partC: _*).orderBy(col("__tp_cell"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val base = within
      .groupBy(partC :+ col("__tp_cell"): _*)
      .agg(sum(value).as("__tp_n"))
      .select(partC :+ col("__tp_cell") :+
        coalesce(sum(col("__tp_n")).over(wOff), lit(0L)).as("__tp_base"): _*)
    within
      .join(broadcast(base), part :+ "__tp_cell")
      .withColumn(as, col("__tp_base") + col("__tp_in"))
      .drop("__tp_cell", "__tp_in", "__tp_base")
  }
}
