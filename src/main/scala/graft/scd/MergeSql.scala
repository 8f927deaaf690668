package graft.scd

import graft.catalog.ParquetCatalog
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, InsertAction, InsertStarAction, LogicalPlan, MergeAction, MergeIntoTable, SubqueryAlias, UpdateAction, UpdateStarAction}
import org.apache.spark.sql.functions._

/** ANSI `MERGE INTO` front door: the SQL surface the engine-native
  * [[ScdMerge]] and the literal 8-statement [[ScdSql]] replay both lack
  * (the reference's own north star names Delta/Iceberg-style merge —
  * SURVEY.md §2, reference `README.md:330-339`).
  *
  * Spark 4 PARSES `MERGE INTO` natively but only EXECUTES it against
  * DataSourceV2 tables; here the parsed [[MergeIntoTable]] (Spark's own
  * grammar — conditions, multi-clause WHEN [NOT] MATCHED [BY SOURCE],
  * UPDATE/DELETE/INSERT, star forms) is compiled onto the engine's
  * merge machinery: ONE full-outer join on the merge condition routes
  * every row through the clause taxonomy with `when/otherwise` — the
  * same single-pass plan shape as [[ScdMerge]], sharing its scale
  * properties (each input scanned once, shuffle keyed on the join
  * condition, broadcastable small side) — and [[execute]] publishes the
  * result atomically through [[graft.catalog.ParquetCatalog]]'s
  * versioned pointer swap.
  *
  * Clause semantics (ANSI / Delta-compatible):
  *   - a target row with a source match takes the FIRST satisfied
  *     `WHEN MATCHED` clause (UPDATE assignments or DELETE); no
  *     satisfied clause carries it unchanged;
  *   - a source row with no target match takes the first satisfied
  *     `WHEN NOT MATCHED` clause (INSERT; unassigned columns NULL);
  *     otherwise it is dropped;
  *   - a target row with no source match takes the first satisfied
  *     `WHEN NOT MATCHED BY SOURCE` clause (UPDATE/DELETE); otherwise
  *     it is carried unchanged;
  *   - [[execute]] rejects a merge in which one target row matches
  *     multiple source rows (the ANSI cardinality violation Delta also
  *     throws on) whenever any MATCHED clause exists.
  *
  * The `INTO` operand must be a named relation (catalog table or
  * view). `USING` additionally accepts an aliased subquery —
  * `USING (SELECT ...) m` — recovered verbatim from the statement text
  * via the parser's origin spans and planned with `spark.sql`.
  * Expressions are rebuilt from the parsed tree's SQL form and
  * resolved against the aliased join, so qualified references
  * (`p.col`, `m.col`) behave exactly as in the statement.
  */
object MergeSql {

  private val TP = "__merge_t_present"
  private val SP = "__merge_s_present"
  private val RID = "__merge_t_rid"
  private val SID = "__merge_s_rid"
  private val CNT = "__merge_match_cnt"
  private val CardMsg =
    "MERGE cardinality violation: a target row matches multiple source rows"

  /** Parse `sql` and compile it into the POST-MERGE target content as
    * one lazy plan (no publish, no cardinality action — with MATCHED
    * clauses, a multi-matched target row fans out pairwise here; use
    * [[execute]] for the enforced ANSI check). `resolve` maps relation
    * names to DataFrames; defaults to `spark.table` (temp views +
    * session catalog).
    */
  def plan(spark: SparkSession, sql: String,
      resolve: String => DataFrame = null,
      evolveSchema: Boolean = false): DataFrame = {
    val r = Option(resolve).getOrElse((n: String) => spark.table(n))
    compile(spark, parse(spark, sql), r, evolve = evolveSchema)
  }

  /** The [[execute]] path's plan without the publish: identical to
    * [[plan]] plus the in-join ANSI cardinality guard (raises on
    * materialization if a target row matches multiple source rows).
    * Exposed so tests can assert the executed plan carries ONE
    * target-vs-source join.
    */
  private[scd] def planChecked(spark: SparkSession, sql: String,
      resolve: String => DataFrame = null,
      evolveSchema: Boolean = false): DataFrame = {
    val r = Option(resolve).getOrElse((n: String) => spark.table(n))
    val mit = parse(spark, sql)
    compile(spark, mit, r, checked = mit.matchedActions.nonEmpty,
      evolve = evolveSchema)
  }

  /** Parse, cardinality-check, and atomically publish: the target must
    * be a [[ParquetCatalog]] table; sources resolve from the catalog
    * first, then session views. Returns the published content.
    */
  /** @param evolveSchema Delta-style automatic schema evolution (opt-in,
    *   like Delta's autoMerge conf): source columns referenced by star
    *   actions or explicit assignments that are absent from the target
    *   schema are APPENDED to it (existing rows read NULL there), and
    *   the widened schema publishes as the table's next catalog version.
    *   Off (default) preserves the strict behavior: unknown assignment
    *   targets error.
    */
  def execute(spark: SparkSession, catalog: ParquetCatalog,
      sql: String, evolveSchema: Boolean = false): DataFrame = {
    val mit = parse(spark, sql)
    val (tName, _) = relName(mit.targetTable)
    require(catalog.exists(tName), s"MERGE target not in catalog: $tName")
    val r: String => DataFrame =
      n => if (catalog.exists(n)) catalog.table(n) else spark.table(n)
    // The ANSI cardinality check rides INSIDE the merge join (see
    // compile's `checked` path): one target-vs-source join total, the
    // violation raised from the plan while the new version materializes.
    // The catalog's versioned pointer swap makes the failure atomic —
    // a raised write job never publishes (and a failed EVOLVING merge
    // leaves the old schema current, same mechanism).
    try catalog.overwrite(tName,
      compile(spark, mit, r, checked = mit.matchedActions.nonEmpty,
        evolve = evolveSchema))
    catch {
      case e: Throwable if causeChain(e).exists(
          t => Option(t.getMessage).exists(_.contains(CardMsg))) =>
        throw new IllegalArgumentException(CardMsg)
    }
    catalog.table(tName)
  }

  private def causeChain(e: Throwable): Iterator[Throwable] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(32)

  private def parse(spark: SparkSession, sql: String): MergeIntoTable =
    spark.sessionState.sqlParser.parsePlan(sql) match {
      case m: MergeIntoTable => m
      case other => throw new IllegalArgumentException(
        s"not a MERGE INTO statement: ${other.nodeName}")
    }

  private def relName(p: LogicalPlan): (String, Option[String]) = p match {
    case SubqueryAlias(ident, child) => (relName(child)._1, Some(ident.name))
    case r: UnresolvedRelation => (r.multipartIdentifier.mkString("."), None)
    case other => throw new IllegalArgumentException(
      "MERGE target must be a named relation; got: " + other.nodeName)
  }

  /** Source operand: a named relation, or an aliased subquery whose
    * text is recovered from the statement via the parser's origin span.
    */
  private def sourceRel(p: LogicalPlan, spark: SparkSession,
      resolve: String => DataFrame): (DataFrame, String) = p match {
    case SubqueryAlias(ident, r: UnresolvedRelation) =>
      (resolve(r.multipartIdentifier.mkString(".")), ident.name)
    case r: UnresolvedRelation =>
      val n = r.multipartIdentifier.mkString(".")
      (resolve(n), n)
    case SubqueryAlias(ident, child) =>
      (child.origin.sqlText, child.origin.startIndex,
          child.origin.stopIndex) match {
        case (Some(txt), Some(a), Some(b)) =>
          (spark.sql(txt.substring(a, b + 1)), ident.name)
        case _ => throw new IllegalArgumentException(
          "cannot recover USING subquery text from parse origins")
      }
    case other => throw new IllegalArgumentException(
      "MERGE source must be a named relation or an aliased subquery; " +
        s"got: ${other.nodeName}")
  }

  private def toCol(e: Expression): Column = expr(e.sql)

  /** Compile the parsed merge onto one full-outer join. With
    * `checked` set (the [[execute]] path, matched clauses present), the
    * ANSI multiple-match detection is folded into the SAME join: each
    * target row carries a row id, a window over the join output counts
    * its source matches (one extra exchange of the join OUTPUT — never
    * a second scan/join of the inputs), and any count > 1 raises from
    * the routing expressions the filter must evaluate for every row —
    * so the violation fires even when the offending rows would be
    * deleted. Unmatched source rows get unique negative window keys
    * (count 1, no skewed null partition).
    */
  private def compile(spark: SparkSession, mit: MergeIntoTable,
      resolve: String => DataFrame, checked: Boolean = false,
      evolve: Boolean = false): DataFrame = {
    val (tName, tAlias) = relName(mit.targetTable)
    val tQ = tAlias.getOrElse(tName)
    val tDf = resolve(tName)
    val (sDf, sQ) = sourceRel(mit.sourceTable, spark, resolve)
    val allActions = mit.matchedActions ++ mit.notMatchedActions ++
      mit.notMatchedBySourceActions
    // Schema evolution: append source-derived columns the target lacks.
    // Star actions contribute every source column not in the target (in
    // source order); explicit assignments contribute their key, typed
    // by resolving the assigned value against the aliased source (new
    // columns' values come from the source — a value needing target
    // columns cannot define a column the target doesn't have).
    val targetFields = tDf.schema.fields.toSeq
    val targetHas = targetFields.map(_.name.toLowerCase).toSet
    val outFields: Seq[org.apache.spark.sql.types.StructField] =
      if (!evolve) targetFields
      else {
        val hasStar = allActions.exists {
          case _: InsertStarAction | _: UpdateStarAction => true
          case _ => false
        }
        val fromStar =
          if (hasStar)
            sDf.schema.fields.toSeq.filterNot(f => targetHas(f.name.toLowerCase))
          else Nil
        val sAliased = sDf.alias(sQ)
        val explicit = allActions.flatMap {
          case u: UpdateAction => u.assignments
          case i: InsertAction => i.assignments
          case _ => Nil
        }.flatMap { a =>
          val raw = a.key match {
            case u: UnresolvedAttribute => u.nameParts.last
            case other => other.sql
          }
          if (targetHas(raw.toLowerCase)) None
          else {
            val dt =
              try sAliased.select(toCol(a.value)).schema.head.dataType
              catch {
                case e: Exception => throw new IllegalArgumentException(
                  s"cannot infer type for evolved MERGE column $raw: the " +
                    "assigned value must resolve against the source alone", e)
              }
            Some(org.apache.spark.sql.types.StructField(raw, dt))
          }
        }
        val newCols = (fromStar ++ explicit)
          .foldLeft(Vector.empty[org.apache.spark.sql.types.StructField]) {
            (acc, f) =>
              if (acc.exists(_.name.toLowerCase == f.name.toLowerCase)) acc
              else acc :+ f
          }
        targetFields ++ newCols
      }
    def tc(c: String): Column = col(s"$tQ.$c")
    // target-side value of an output column: NULL (typed by the route
    // cast) for columns that exist only post-evolution
    def tcol(c: String): Column =
      if (targetHas(c.toLowerCase)) tc(c) else lit(null)
    def sc(c: String): Column = col(s"$sQ.$c")
    // assignment keys resolve like Spark's default analyzer:
    // case-insensitively against the target schema, unknown -> error
    val byLower = outFields.map(f => f.name.toLowerCase -> f.name).toMap
    def asgKey(a: Assignment): String = {
      val raw = a.key match {
        case u: UnresolvedAttribute => u.nameParts.last
        case other => other.sql
      }
      byLower.getOrElse(raw.toLowerCase, throw new IllegalArgumentException(
        s"unknown target column in MERGE assignment: $raw"))
    }

    // Assignment coercion is LOUD (ANSI/Delta-style store assignment):
    // a non-null clause value that does not convert to the target
    // column type (non-numeric string into BIGINT, malformed
    // timestamp, ...) raises instead of silently writing NULL. Applied
    // to the RAW clause value at extraction — before the clause fold's
    // CaseWhen, whose ANSI type coercion would otherwise wrap the
    // value in its own throwing cast first. The probe uses try_cast so
    // the guard itself never ANSI-throws: the error is ours in both
    // ANSI modes.
    val fieldBy = outFields.map(f => f.name -> f).toMap
    def coerce(v: Column, f: org.apache.spark.sql.types.StructField): Column =
      when(v.isNotNull && v.try_cast(f.dataType).isNull,
        raise_error(lit("MERGE assignment value not coercible to " +
          s"${f.name}: ${f.dataType.simpleString}")).cast(f.dataType))
        .otherwise(v.try_cast(f.dataType))
    def coerceAsg(xs: Seq[Assignment]): Map[String, Column] =
      xs.map { x =>
        val k = asgKey(x); k -> coerce(toCol(x.value), fieldBy(k))
      }.toMap

    // Per-class routing: a value function (output column -> Column) and
    // a keep flag, folded so the FIRST satisfied clause wins.
    case class Routed(value: String => Column, keep: Column)
    def fold(acts: Seq[MergeAction], default: Routed): Routed =
      acts.foldRight(default) { (a, acc) =>
        val cond = a.condition.map(toCol).getOrElse(lit(true))
        val (v, k): (String => Column, Column) = a match {
          case u: UpdateAction =>
            val m = coerceAsg(u.assignments)
            (c => m.getOrElse(c, tcol(c)), lit(true))
          case _: UpdateStarAction => (c => sc(c), lit(true))
          case _: DeleteAction => (c => tcol(c), lit(false))
          case i: InsertAction =>
            val m = coerceAsg(i.assignments)
            (c => m.getOrElse(c, lit(null)), lit(true))
          case _: InsertStarAction => (c => sc(c), lit(true))
          case other => throw new IllegalArgumentException(
            s"unsupported MERGE action: ${other.getClass.getSimpleName}")
        }
        Routed(c => when(cond, v(c)).otherwise(acc.value(c)),
          when(cond, k).otherwise(acc.keep))
      }
    val matched = fold(mit.matchedActions, Routed(tcol, lit(true)))
    val inserts = fold(mit.notMatchedActions,
      Routed(_ => lit(null), lit(false)))
    val tgtOnly = fold(mit.notMatchedBySourceActions, Routed(tcol, lit(true)))
    def route(df: DataFrame, r: Routed): DataFrame =
      df.filter(r.keep)
        .select(outFields.map(f =>
          r.value(f.name).cast(f.dataType).as(f.name)): _*)

    if (mit.matchedActions.isEmpty) {
      // No MATCHED clause: an ANSI insert-only (or source-delete-only)
      // merge ALLOWS a target row to match many source rows — it must
      // still carry exactly once, so route set-wise (semi/anti joins),
      // never through the pairwise outer join.
      val cond = toCol(mit.mergeCondition)
      val t = tDf.alias(tQ)
      val s = sDf.alias(sQ)
      val carried = t.join(s, cond, "left_semi")
        .select(outFields.map(f =>
          (if (targetHas(f.name.toLowerCase)) col(f.name)
           else lit(null).cast(f.dataType)).as(f.name)): _*)
      val unmatched = route(t.join(s, cond, "left_anti"), tgtOnly)
      val inserted = route(s.join(t, cond, "left_anti"), inserts)
      carried.unionByName(unmatched).unionByName(inserted)
    } else {
      val t0 = tDf.withColumn(TP, lit(true))
      val t = (if (checked) t0.withColumn(RID, monotonically_increasing_id())
               else t0).alias(tQ)
      val s0 = sDf.withColumn(SP, lit(true))
      val s = (if (checked) s0.withColumn(SID, monotonically_increasing_id())
               else s0).alias(sQ)
      val joined0 = t.join(s, toCol(mit.mergeCondition), "full_outer")
      val sP = coalesce(col(SP), lit(false))
      val joined =
        if (checked) joined0.withColumn(CNT,
          sum(when(sP, lit(1L)).otherwise(lit(0L))).over(
            org.apache.spark.sql.expressions.Window.partitionBy(
              coalesce(col(RID), -col(SID) - lit(1L)))))
        else joined0
      val tP0 = coalesce(col(TP), lit(false))
      val tP =
        if (checked)
          when(col(CNT) > lit(1L), raise_error(lit(CardMsg)).cast("boolean"))
            .otherwise(tP0)
        else tP0
      val keep = when(tP && sP, matched.keep)
        .when(!tP && sP, inserts.keep)
        .otherwise(tgtOnly.keep)
      val outCols = outFields.map { f =>
        when(tP && sP, matched.value(f.name).cast(f.dataType))
          .when(!tP && sP, inserts.value(f.name).cast(f.dataType))
          .otherwise(tgtOnly.value(f.name).cast(f.dataType))
          .as(f.name)
      }
      joined.filter(keep).select(outCols: _*)
    }
  }
}
