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
  * per-row prefix and the subtotal aggregate) to see the SAME slicing.
  * The slicing is therefore carried as DATA: the sliced relation, its
  * `spark_partition_id`-derived cell ids, and the within-slice prefix
  * are materialized ONCE (eager `localCheckpoint`) and every
  * downstream reader consumes the same frozen blocks — the window
  * computes once, and the phases cannot disagree no matter how the
  * planner schedules the two subtrees.
  *
  * Why not exchange reuse (the original design): with two readers of
  * one range exchange, correctness rode on `ReusedExchange`/the AQE
  * stage cache unifying the subtrees. That held for a single prefix
  * sum (RankingSpec observed the reuse) but broke for STACKED prefix
  * sums (q112) at sf0.1 — with the exchange planned twice,
  * `RangePartitioner` re-samples imbalanced partitions with an
  * rdd.id-derived seed, so the two copies pick DIFFERENT bounds, and
  * it failed under AQE on and off alike. Materializing the slicing is
  * robust by construction, at the cost of one stored copy of the
  * relation (storage-comparable to the shuffle files the exchange
  * already wrote; it also REMOVES the doubled window computation).
  *
  * Defense in depth stays: an in-plan guard raises at execution if the
  * phases ever diverged anyway — a row whose slice is missing from the
  * subtotal relation, or whose within-slice prefix exceeds its slice's
  * total (`value` must be NONNEGATIVE — both callers sum counts),
  * fails the job instead of emitting wrong offsets.
  *
  * The `order` must be TOTAL within each `part` group (include a
  * unique tiebreak) — with ties, within-slice order would be
  * nondeterministic.
  */
object TwoPhase {

  /** The lazy sliced-and-prefixed relation: range exchange, cell ids,
    * within-slice prefix. Exposed for plan tests — [[prefixSum]]
    * consumes it through one materialization. */
  private[graft] def slicedWithin(df: DataFrame, part: Seq[String],
      order: Seq[String], value: Column): DataFrame = {
    val partC = part.map(col)
    val orderC = order.map(col)
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    val wCell = Window.partitionBy(partC :+ col("__tp_cell"): _*)
      .orderBy(orderC: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.repartitionByRange(n, partC ++ orderC: _*)
      .withColumn("__tp_cell", spark_partition_id())
      .withColumn("__tp_val", value.cast("long"))
      .withColumn("__tp_in", sum(col("__tp_val")).over(wCell))
  }

  /** Inclusive prefix sum of `value` over the named `order` columns
    * within each named `part` group, as column `as`. With `part`
    * empty: one global sequence. Internal `__tp_*` columns are
    * dropped from the result. EAGER: the sliced relation materializes
    * when this is called (see class doc).
    */
  def prefixSum(df: DataFrame, part: Seq[String], order: Seq[String],
      value: Column, as: String): DataFrame = {
    val partC = part.map(col)
    val within = slicedWithin(df, part, order, value).localCheckpoint()
    val wOff = Window.partitionBy(partC: _*).orderBy(col("__tp_cell"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val base = within
      .groupBy(partC :+ col("__tp_cell"): _*)
      .agg(sum(col("__tp_val")).as("__tp_n"))
      .select(partC :+ col("__tp_cell") :+ col("__tp_n") :+
        coalesce(sum(col("__tp_n")).over(wOff), lit(0L)).as("__tp_base"): _*)
    within
      .join(broadcast(base), part :+ "__tp_cell", "left")
      .withColumn(as,
        when(col("__tp_base").isNull || col("__tp_in") > col("__tp_n"),
          raise_error(lit("TwoPhase.prefixSum: phase divergence — the " +
            "two readers saw different slicings")))
          .otherwise(col("__tp_base") + col("__tp_in")))
      .drop("__tp_cell", "__tp_val", "__tp_in", "__tp_base", "__tp_n")
  }
}
