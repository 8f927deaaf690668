package graft.scd

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SCD variants beyond the reference's Type-1/Type-2 hybrid: Type 3
  * (previous-value columns, in-place) and Type 4 (current table +
  * append-only history table). Both are single-pass plans over one
  * full-outer join — the same scale shape as [[ScdMerge]]: the join
  * shuffles on the business key, everything else is row-local.
  */
object ScdVariants {

  /** Type-3 merge: tracked columns keep exactly one generation of
    * history in a sibling `prev_<col>` column; rows are updated in
    * place, never versioned.
    *
    * Branches: production-only rows carry verbatim; matched rows with a
    * change move current -> prev and adopt the staging value (unchanged
    * tracked columns keep their existing prev); staging-only rows insert
    * with NULL prev columns. Change detection is null-safe.
    *
    * @param production current dimension: businessKeys ++ tracked ++
    *   `prev_<tracked>` (any other columns carry through untouched on
    *   matches from the PRODUCTION side).
    * @param staging snapshot: businessKeys ++ tracked.
    */
  def mergeType3(production: DataFrame, staging: DataFrame,
      businessKeys: Seq[String], tracked: Seq[String]): DataFrame = {
    require(businessKeys.nonEmpty && tracked.nonEmpty)
    val outCols = production.columns.toSeq
    tracked.foreach { c =>
      require(outCols.contains(c) && outCols.contains(s"prev_$c"),
        s"production needs $c and prev_$c")
    }
    val prodTypes = production.schema.map(f => f.name -> f.dataType).toMap
    val P = "__p_"; val S = "__s_"
    val p = production
      .select(outCols.map(c => col(c).as(P + c)) :+ lit(true).as(P + "present"): _*)
    val s = staging
      .select((businessKeys ++ tracked)
        .map(c => col(c).cast(prodTypes(c)).as(S + c))
        :+ lit(true).as(S + "present"): _*)
    def pc(c: String) = col(P + c)
    def sc(c: String) = col(S + c)
    val joined = p.join(s,
      businessKeys.map(k => pc(k) === sc(k)).reduce(_ && _), "full_outer")
    val pPresent = coalesce(pc("present"), lit(false))
    val sPresent = coalesce(sc("present"), lit(false))
    val out = outCols.map { c =>
      val base = tracked.find(t => c == t || c == s"prev_$t") match {
        case Some(t) if c == t => // tracked column: adopt staging on match
          when(!sPresent, pc(c)).otherwise(sc(t))
        case Some(t) => // prev column: shift on change, keep otherwise
          when(!sPresent || !pPresent, pc(c)) // insert keeps NULL prev
            .when(pc(t) <=> sc(t), pc(c))
            .otherwise(pc(t))
        case None =>
          if (businessKeys.contains(c)) coalesce(pc(c), sc(c))
          else pc(c) // carry-through column (NULL on inserts)
      }
      base.cast(prodTypes(c)).as(c)
    }
    joined.select(out: _*)
  }

  /** Type-4 split of a Type-2 merge: the CURRENT table holds exactly one
    * row per business key (no bookkeeping churn in the hot table), the
    * HISTORY table receives every superseded version as an append.
    *
    * Runs the full [[ScdMerge]] once (one lazy plan), labels each output
    * row with its destination side, and exposes both views:
    *
    *  - [[Type4Result.labeled]] is the SINGLE-PASS publish path: one
    *    merge execution, written once `partitionBy("side")` — at scale
    *    the merge join runs exactly once and the split is a free
    *    partitioned write, where filtering `current` and `historyAppend`
    *    separately would execute the merge twice.
    *  - `current` / `historyAppend` are filters of the same labeled plan
    *    for callers that want the individual relations.
    */
  def mergeType4(production: DataFrame, staging: DataFrame,
      schema: ScdSchema, opts: MergeOptions): Type4Result = {
    val merged = ScdMerge.merge(production, staging, schema, opts)
    val labeled = merged.withColumn("side",
        when(col(schema.activeCol), lit("current"))
          .when(col(schema.endCol) === lit(opts.asOf), lit("closed")))
      .filter(col("side").isNotNull)
    Type4Result(
      current = labeled.filter(col("side") === "current").drop("side"),
      historyAppend = labeled.filter(col("side") === "closed").drop("side"),
      labeled = labeled)
  }

  /** `labeled` = current ∪ historyAppend with a `side` discriminator
    * column ("current" / "closed"), produced by ONE merge pass.
    */
  final case class Type4Result(current: DataFrame, historyAppend: DataFrame,
      labeled: DataFrame)

  /** Type-6 ("hybrid 1+2+3") merge: the full Type-2 version history PLUS
    * a `cur_<col>` sibling for every Type-2 column carrying the member's
    * CURRENT value on every historical row — so point-in-time queries
    * can group/filter by today's attribute without a self-join to the
    * active row.
    *
    * One [[ScdMerge]] pass, then one window partitioned by the business
    * key propagates each member's single active-row value to all its
    * versions (`max` over the one non-null `when(active, col)` — no
    * arithmetic, so values carry bit-exactly). Scale shape: the merge
    * join already shuffles on the business key; the propagation window
    * re-keys on the same columns — one additional key-partitioned
    * exchange, no ordering sort (partition-only window).
    */
  def mergeType6(production: DataFrame, staging: DataFrame,
      schema: ScdSchema, opts: MergeOptions): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val merged = ScdMerge.merge(production, staging, schema, opts)
    val w = Window.partitionBy(schema.businessKeys.map(col): _*)
    // one select so all cur_ columns land in a SINGLE Window node
    // (withColumn-per-column interleaves Projects that block
    // CollapseWindow, stacking one Window exec per tracked column)
    merged.select(col("*") +: schema.type2Cols.map(c =>
      max(when(col(schema.activeCol), col(c))).over(w).as(s"cur_$c")): _*)
  }
}
