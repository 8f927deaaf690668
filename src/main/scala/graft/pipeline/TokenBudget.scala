package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget waterfill: fit a multi-source corpus under a global
  * token budget by spending the budget down a priority order — the
  * epoch-construction step after [[Mixture]]'s fixed-rate sampling.
  * Sources that fit entirely keep every document; the single marginal
  * source that straddles the budget line is downsampled at an integer
  * parts-per-[[Mixture.Unit]] rate sized to the remaining budget; lower
  * priority sources drop outright.
  *
  * Everything is exact integer arithmetic — token counts, cumulative
  * sums, the budget as a `num/den` fraction of the total, the marginal
  * rate as `remaining * Unit div tok_in` — and document membership in
  * the marginal source is [[Mixture.keepExpr]]'s md5 hash-gate, so the
  * whole allocation AND the sampled row set are reproducible on any
  * cluster layout and replay bit-identically in the DuckDB oracle
  * (q96).
  *
  * Scale shape: one per-source aggregation (map-side combinable) feeds
  * a source-count-sized allocation relation (thousands of rows at
  * most — the windows over it are driver-scale, not data-scale), which
  * broadcast-joins back onto the corpus for the hash-gate filter. The
  * corpus itself is never shuffled.
  */
object TokenBudget {

  /** Per-source allocation plan.
    *
    * @param priority expression totally ordering sources (ties broken
    *   by the source column itself); LOWER sorts first = funded first
    * @param tokens per-document token count expression
    * @param budgetNum,budgetDen budget = total_tokens * num div den
    * @return (srcCol, priority, n_in, tok_in, cum_before, budget,
    *   keep_ppm) — one row per source
    */
  def allocate(docs: DataFrame, srcCol: String, priority: Column,
      tokens: Column, budgetNum: Long, budgetDen: Long): DataFrame = {
    require(budgetNum >= 0 && budgetDen > 0, "budget fraction")
    val perSrc = docs
      .groupBy(col(srcCol), priority.as("priority"))
      .agg(count(lit(1)).as("n_in"),
        sum(tokens.cast("long")).as("tok_in"))
    // The window frames below order the WHOLE allocation relation — a
    // row per source, not per document — so the single-partition sort
    // is bounded by the source count.
    val byPriority = Window
      .orderBy(col("priority"), col(srcCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    perSrc
      .withColumn("cum_before",
        coalesce(sum(col("tok_in")).over(byPriority), lit(0L)))
      .withColumn("budget",
        expr(s"sum(tok_in) over () * $budgetNum div $budgetDen"))
      .withColumn("keep_ppm",
        when(col("cum_before") >= col("budget"), lit(0L))
          .when(col("cum_before") + col("tok_in") <= col("budget"),
            lit(Mixture.Unit))
          .otherwise(expr(
            s"(budget - cum_before) * ${Mixture.Unit} div tok_in")))
  }

  /** Apply an [[allocate]] plan: keep each document iff its source's
    * rate admits its id hash. Returns the surviving rows plus the
    * `keep_ppm` that admitted them.
    */
  def sample(docs: DataFrame, idCol: String, srcCol: String,
      alloc: DataFrame): DataFrame =
    docs
      .join(broadcast(alloc.select(col(srcCol), col("keep_ppm"))),
        Seq(srcCol))
      .filter(Mixture.keepExpr(col(idCol), col("keep_ppm")))
}
