package graft.scd

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD Type-1 + Type-2 merge as a single-pass Spark plan.
  *
  * Semantics re-expressed from the reference 8-statement HiveQL pipeline
  * (reference `SCD_script.txt:1-155`; branch taxonomy in SURVEY.md §2.3(1)),
  * but Spark-first: instead of 6 INSERT statements scanning production and
  * staging once each, ONE full-outer join on the business key routes every
  * row into its branch with `when/otherwise`, and the changed-row fan-out
  * (close old version + open new version) is an `explode` of a 2-element
  * struct array. Each input is scanned once; Catalyst handles pushdown,
  * pruning, and join-strategy selection (broadcast when staging is small,
  * sort-merge otherwise — at 100 TB both sides shuffle-partition on the
  * business key, which is exactly the partitioning the join needs).
  *
  * Branches (reference step numbers in parens):
  *  - B1 production-only      -> carried verbatim               (step 2)
  *       (with `closeMissing`: active production-only rows are detected
  *        deletes and closed instead — no reference step; the reference
  *        has no delete branch at all, SURVEY.md §2.3(6))
  *  - B2 matched, inactive    -> carried, Type-1 refreshed      (step 3)
  *  - B3 matched, active, ==  -> carried, Type-1 refreshed      (step 4)
  *  - B4 matched, active, !=  -> closed: end=asOf, active=false (step 5)
  *  - B5   (same row as B4)   -> reopened: version+1, start=asOf (step 6)
  *  - B6 staging-only         -> brand new, version 1            (step 7)
  *
  * Type-1 refresh deliberately reaches historical rows (B2) — Kimball
  * "hybrid" semantics, exactly as the reference does at
  * `SCD_script.txt:22-24` (SURVEY.md §2.3(2)).
  */
object ScdMerge {

  private val P = "__p_"
  private val S = "__s_"

  /** Merge `staging` (a source snapshot: business columns only) into
    * `production` (the current dimension). Returns the new dimension content
    * with the same schema/column order as `production`. Lazy: builds one
    * logical plan, no actions. Publish with [[graft.catalog.ParquetCatalog]]
    * or any writer.
    */
  def merge(
      production: DataFrame,
      staging: DataFrame,
      schema: ScdSchema,
      opts: MergeOptions): DataFrame = {
    val outCols = production.columns.toSeq
    val missing = (schema.surrogateCol +: (schema.stagingCols ++ schema.scdCols))
      .filterNot(outCols.contains)
    require(missing.isEmpty, s"production is missing declared columns: $missing")
    val sMissing = schema.stagingCols.filterNot(staging.columns.contains)
    require(sMissing.isEmpty, s"staging is missing declared columns: $sMissing")

    val prodTypes = production.schema.map(f => f.name -> f.dataType).toMap

    // Prefix both sides instead of relying on alias disambiguation; add
    // presence markers so full-outer null-padding is detectable even when
    // business columns are legitimately NULL.
    val p = production
      .select(outCols.map(c => col(c).as(P + c)) :+ lit(true).as(P + "present"): _*)
    val s = staging
      .select(schema.stagingCols.map(c => col(c).cast(prodTypes(c)).as(S + c))
        :+ lit(true).as(S + "present"): _*)

    def pc(c: String): Column = col(P + c)
    def sc(c: String): Column = col(S + c)

    // Business keys are assumed non-null (the reference never checks;
    // SURVEY.md §2.3(6)) so plain equality keys keep the join hashable.
    val joinCond = schema.businessKeys.map(k => pc(k) === sc(k)).reduce(_ && _)
    val joined = p.join(s, joinCond, "full_outer")

    val pPresent = coalesce(pc("present"), lit(false))
    val sPresent = coalesce(sc("present"), lit(false))
    val pActive = pc(schema.activeCol)

    // Type-2 change detection. Null-safe mode closes the reference's NULL
    // black-hole; compat mode reproduces it bit-for-bit (SURVEY.md §2.3(3)).
    def eqCol(c: String): Column =
      if (opts.nullSafeCompare) pc(c) <=> sc(c)
      else if (opts.coalesceCompareCols(c))
        coalesce(pc(c).cast("string"), lit("")) === coalesce(sc(c).cast("string"), lit(""))
      else pc(c) === sc(c)
    def neqCol(c: String): Column =
      if (opts.nullSafeCompare) !(pc(c) <=> sc(c))
      else if (opts.coalesceCompareCols(c))
        coalesce(pc(c).cast("string"), lit("")) =!= coalesce(sc(c).cast("string"), lit(""))
      else pc(c) =!= sc(c)
    // NOT negations of each other under three-valued logic: with
    // nullSafeCompare=false a NULL comparison fails BOTH, dropping the row.
    val t2Unchanged = schema.type2Cols.map(eqCol).reduce(_ && _)
    val t2Changed = schema.type2Cols.map(neqCol).reduce(_ || _)

    def outField(c: String, v: Column): Column = v.cast(prodTypes(c)).as(c)

    /** Carried production row; optionally Type-1-refreshed from staging,
      * optionally closed (end=asOf, active=false).
      */
    def carried(type1FromStaging: Boolean, close: Boolean): Column =
      struct(outCols.map { c =>
        val v =
          if (type1FromStaging && schema.type1Cols.contains(c)) sc(c)
          else if (close && c == schema.endCol) lit(opts.asOf)
          else if (close && c == schema.activeCol) lit(false)
          else pc(c)
        outField(c, v)
      }: _*)

    /** Newly-opened version built from the staging row. Surrogate key is
      * left NULL here (as the reference inserts NULL at
      * `SCD_script.txt:89,123`) and assigned below.
      */
    def opened(firstVersion: Boolean): Column =
      struct(outCols.map { c =>
        val v =
          if (c == schema.surrogateCol) lit(null)
          else if (c == schema.versionCol)
            (if (firstVersion) lit(1) else pc(schema.versionCol) + lit(1))
          else if (c == schema.startCol) lit(opts.asOf)
          else if (c == schema.endCol) lit(opts.highDate)
          else if (c == schema.activeCol) lit(true)
          else sc(c)
        outField(c, v)
      }: _*)

    val emptyBranch = slice(array(carried(false, false)), 1, 0) // typed empty
    // B1: with closeMissing, an ACTIVE row whose key vanished from the
    // (full) staging snapshot is a detected delete -> closed; inactive
    // history is carried verbatim either way
    val prodOnly =
      if (opts.closeMissing)
        when(coalesce(pActive, lit(false)), array(carried(false, true)))
          .otherwise(array(carried(false, false)))
      else array(carried(false, false))
    val branch =
      when(pPresent && !sPresent, prodOnly)
        .when(pPresent && sPresent && !coalesce(pActive, lit(false)),
          array(carried(true, false)))
        .when(pPresent && sPresent && pActive && t2Unchanged,
          array(carried(true, false)))
        .when(pPresent && sPresent && pActive && t2Changed,
          array(carried(true, true), opened(false)))
        .when(!pPresent && sPresent, array(opened(true)))
        .otherwise(emptyBranch) // compat-mode NULL black-hole lands here

    val exploded = joined.select(explode(branch).as("__r")).select(col("__r.*"))

    assignSurrogates(exploded, production, schema, opts)
      .select(outCols.map(col): _*)
  }

  /** Surrogate-key assignment (SURVEY.md §2.3(4), §7.4).
    *
    * Stable mode: existing keys survive; only NULL-keyed (new) rows are
    * ranked. The rank window partitions on `isNull(surrogate)` so the global
    * sort touches ONLY the new-row partition — per-batch new-row counts are
    * small relative to the dimension, so this stays tractable at scale while
    * existing rows stream through untouched. The `max(existing)` scalar rides
    * in as a broadcast cross-join, keeping the whole merge one lazy plan.
    *
    * HiveCompat mode: global renumber like reference `SCD_script.txt:143`,
    * deterministic via the (start, keys, version) total tiebreak.
    *
    * If a deployment's per-batch increments ever rival the dimension
    * itself, [[graft.operators.Ranking.globalRowNumber]] ranks the same
    * total order two-phase (range slices + broadcast count offsets) —
    * not used here because its slice window would add a hash exchange
    * inside the otherwise exchange-free bucketed merge plan (the q89
    * property), and increments are batch-sized by construction.
    */
  private def assignSurrogates(
      merged: DataFrame,
      production: DataFrame,
      schema: ScdSchema,
      opts: MergeOptions): DataFrame = {
    val surr = schema.surrogateCol
    val surrType = production.schema(surr).dataType
    val tieBreak = schema.businessKeys.map(c => col(c).asc) :+ col(schema.versionCol).asc
    opts.keyMode match {
      case KeyMode.Stable =>
        val maxIdDf = production
          .agg(coalesce(max(col(surr).cast("long")), lit(0L)).as("__max_id"))
        // Split instead of a single Window.partitionBy(isNull(surr)):
        // that formulation funnels EVERY row through a <=2-partition
        // exchange. Here existing rows bypass the window entirely and
        // only the (small) new-row set is globally ranked; the join
        // subtree appears in both branches but its shuffle exchanges are
        // identical, so ReuseExchange materializes them once.
        val w = Window.orderBy(tieBreak: _*)
        val existing = merged.filter(col(surr).isNotNull)
        val fresh = merged.filter(col(surr).isNull)
          .crossJoin(broadcast(maxIdDf))
          .withColumn(surr,
            (col("__max_id") + row_number().over(w)).cast(surrType))
          .drop("__max_id")
        existing.unionByName(fresh)
      case KeyMode.HiveCompat =>
        val w = Window.orderBy(col(schema.startCol).asc +: tieBreak: _*)
        merged.withColumn(surr, row_number().over(w).cast(surrType))
    }
  }

  /** Deduplicate a staging snapshot that may carry multiple rows per business
    * key: keep the last row by `orderCol`. The reference would silently fan
    * out duplicates (SURVEY.md §2.3(6)); callers opt into an explicit policy.
    */
  def dedupeStagingLatest(
      staging: DataFrame,
      schema: ScdSchema,
      orderCol: String): DataFrame = {
    val w = Window
      .partitionBy(schema.businessKeys.map(col): _*)
      .orderBy(col(orderCol).desc)
    staging
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
