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
  * materializes the exchange once (`ReusedExchange` in the plan, or
  * AQE's stage cache keyed on the canonicalized exchange). Defense in
  * depth, because a silent reuse failure would mean silently wrong
  * sums:
  *   - the config guard turns `spark.sql.exchange.reuse=false` into a
  *     loud error;
  *   - the range shuffle pins an EXPLICIT partition count, so AQE
  *     never rewrites one reader's shuffle-read (coalesce) without the
  *     other — user-numbered repartitions are left alone;
  *   - the subtotal aggregate consumes the WINDOW output (the same
  *     `within` subtree as the per-row reader, canonically identical,
  *     and already clustered by `(part, slice)` so the aggregate adds
  *     no exchange of its own);
  *   - an in-plan guard raises at execution if the phases diverged
  *     anyway: a row whose slice is missing from the subtotal
  *     relation, or whose within-slice prefix exceeds its slice's
  *     total (`value` must be NONNEGATIVE — both callers sum counts),
  *     fails the job instead of emitting wrong offsets.
  * RankingSpec additionally asserts the executed plan carries exactly
  * one range exchange (reuse observed, not assumed).
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
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    val sliced = df
      .repartitionByRange(n, partC ++ orderC: _*)
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
      .select(partC :+ col("__tp_cell") :+ col("__tp_n") :+
        coalesce(sum(col("__tp_n")).over(wOff), lit(0L)).as("__tp_base"): _*)
    within
      .join(broadcast(base), part :+ "__tp_cell", "left")
      .withColumn(as,
        when(col("__tp_base").isNull || col("__tp_in") > col("__tp_n"),
          raise_error(lit("TwoPhase.prefixSum: phase divergence — the " +
            "two readers of the range exchange saw different slicings")))
          .otherwise(col("__tp_base") + col("__tp_in")))
      .drop("__tp_cell", "__tp_in", "__tp_base", "__tp_n")
  }
}
