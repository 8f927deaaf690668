package graft.scd

import graft.catalog.ParquetCatalog
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteFromTable, LogicalPlan, SubqueryAlias, UpdateTable}
import org.apache.spark.sql.functions._

/** ANSI `DELETE FROM` / `UPDATE` front door — the two DML statements
  * that complete the triad with [[MergeSql]]'s `MERGE INTO`. Spark 4
  * PARSES both natively but only executes them against DataSourceV2
  * tables; here the parsed [[DeleteFromTable]]/[[UpdateTable]] compiles
  * onto plain relational plans over the engine's catalog:
  *
  *   - `DELETE FROM t [AS a] WHERE p` → keep rows where `p` is FALSE
  *     or NULL (ANSI: only rows where the predicate is TRUE delete);
  *     one filter, no join, no shuffle;
  *   - `UPDATE t [AS a] SET c = e, ... [WHERE p]` → per assigned
  *     column `when(p, e).otherwise(c)`; one projection over one scan.
  *
  * [[execute]] publishes the post-statement content through
  * [[ParquetCatalog]]'s copy-on-write versioned pointer swap — each
  * statement is one atomic new version, concurrent readers keep their
  * snapshot, and time travel holds the pre-statement content (the
  * deletion-compliance posture: [[graft.pipeline.Purge]] is the
  * all-versions variant when history must ALSO forget).
  *
  * Both compile row-locally: at 100 TB a DELETE/UPDATE is a full scan
  * + rewrite of the table (the copy-on-write cost every snapshot table
  * format pays without deletion vectors), with zero exchanges in the
  * plan — partition-local writes all the way.
  */
object DmlSql {

  /** Parse `sql` and compile it into the POST-statement target content
    * as one lazy plan (no publish). `resolve` maps relation names to
    * DataFrames; defaults to `spark.table`.
    */
  def plan(spark: SparkSession, sql: String,
      resolve: String => DataFrame = null): DataFrame = {
    val r = Option(resolve).getOrElse((n: String) => spark.table(n))
    compile(spark, parse(spark, sql), r)._2
  }

  /** Parse and atomically publish: the target must be a
    * [[ParquetCatalog]] table. Returns the published content.
    */
  def execute(spark: SparkSession, catalog: ParquetCatalog,
      sql: String): DataFrame = {
    val parsed = parse(spark, sql)
    val (tName, content) = compile(spark, parsed,
      n => { require(catalog.exists(n), s"DML target not in catalog: $n")
        catalog.table(n) })
    catalog.overwrite(tName, content)
    catalog.table(tName)
  }

  private def parse(spark: SparkSession, sql: String): LogicalPlan =
    spark.sessionState.sqlParser.parsePlan(sql) match {
      case p @ (_: DeleteFromTable | _: UpdateTable) => p
      case other => throw new IllegalArgumentException(
        s"not a DELETE FROM / UPDATE statement: ${other.nodeName}")
    }

  private def relName(p: LogicalPlan): (String, Option[String]) = p match {
    case SubqueryAlias(ident, child) => (relName(child)._1, Some(ident.name))
    case r: UnresolvedRelation => (r.multipartIdentifier.mkString("."), None)
    case other => throw new IllegalArgumentException(
      "DML target must be a named relation; got: " + other.nodeName)
  }

  private def toCol(e: Expression): Column = expr(e.sql)

  /** Assigned columns of an UPDATE, keyed by lowercase column name.
    * Keys resolve from the parsed attribute's nameParts (NOT by
    * splitting rendered SQL on '.': a backtick-quoted column containing
    * a dot would mis-split), and a qualifier must name the target —
    * `SET other.c = e` when the alias is `t` is a user error, not an
    * assignment to c.
    */
  private def assignedMap(t: DataFrame, assignments: Seq[Assignment],
      name: String, alias: Option[String]): Map[String, Column] =
    assignments.map {
      case Assignment(key, value) =>
        val parts = key match {
          case a: org.apache.spark.sql.catalyst.analysis
              .UnresolvedAttribute => a.nameParts
          case other => throw new IllegalArgumentException(
            s"unsupported UPDATE assignment key: ${other.sql}")
        }
        val colName = parts.last
        if (parts.length > 1) {
          val qual = parts.init.mkString(".")
          val target = alias.getOrElse(name)
          require(qual.equalsIgnoreCase(target) ||
              qual.equalsIgnoreCase(name),
            s"UPDATE assignment qualifier '$qual' does not match " +
              s"target '$target'")
        }
        require(t.columns.exists(_.equalsIgnoreCase(colName)),
          s"UPDATE assigns unknown column $colName of $name")
        colName.toLowerCase -> toCol(value)
    }.toMap

  /** [[execute]] through the MERGE-ON-READ path: instead of rewriting
    * the whole table version (copy-on-write — O(table) for a one-row
    * DELETE), publish a DELTA version carrying only the deletion
    * vector of `keyCol` values the predicate matched (DELETE), plus
    * the reassigned rows (UPDATE = delete matched + append updated —
    * the classic MoR upsert shape). The write cost is O(matched rows);
    * scans pay one anti-join per outstanding delta until
    * [[ParquetCatalog.compact]] folds the chain back into a FULL
    * version. Same ANSI semantics as [[execute]] — q197's oracle is
    * q176's verbatim.
    *
    * @param keyCol row-identity column the deletion vector stores —
    *   must be unique per row (the table's primary key)
    */
  def executeMor(spark: SparkSession, catalog: ParquetCatalog,
      sql: String, keyCol: String): DataFrame = parse(spark, sql) match {

    case DeleteFromTable(table, condition) =>
      val (name, alias) = relName(table)
      require(catalog.exists(name), s"DML target not in catalog: $name")
      // Version is read ONCE and pinned: the predicate evaluates
      // against exactly the snapshot the delta chains onto — a
      // concurrent publish between read and publish is a loud
      // ConcurrentModificationException, never a silently clobbered
      // delta against content the predicate never saw.
      val v = catalog.currentVersion(name).get
      val t = alias.foldLeft(catalog.tableAsOfVersion(name, v))(_.alias(_))
      // ANSI: a row deletes iff the predicate is TRUE — the deletion
      // vector holds exactly those keys
      catalog.publishDelta(name, keyCol,
        t.filter(coalesce(toCol(condition), lit(false)))
          .select(col(keyCol)), expectedBase = Some(v))
      catalog.table(name)

    case UpdateTable(table, assignments, condition) =>
      val (name, alias) = relName(table)
      require(catalog.exists(name), s"DML target not in catalog: $name")
      val v = catalog.currentVersion(name).get
      val t = alias.foldLeft(catalog.tableAsOfVersion(name, v))(_.alias(_))
      val cond = condition.map(c => coalesce(toCol(c), lit(false)))
        .getOrElse(lit(true))
      val assigned = assignedMap(t, assignments, name, alias)
      val matched = t.filter(cond)
      val updated = matched.select(t.columns.map(c =>
        assigned.getOrElse(c.toLowerCase, col(c)).as(c)).toSeq: _*)
      catalog.publishDelta(name, keyCol,
        matched.select(col(keyCol)), Some(updated),
        expectedBase = Some(v))
      catalog.table(name)

    case other => throw new IllegalArgumentException(
      s"unsupported DML statement: ${other.nodeName}")
  }

  /** @return (target table name, post-statement content plan) */
  private def compile(spark: SparkSession, parsed: LogicalPlan,
      resolve: String => DataFrame): (String, DataFrame) = parsed match {

    case DeleteFromTable(table, condition) =>
      val (name, alias) = relName(table)
      val t = alias.foldLeft(resolve(name))(_.alias(_))
      // ANSI: a row deletes iff the predicate is TRUE; FALSE and NULL
      // both keep it — hence the explicit coalesce, not a bare negation
      (name, t.filter(!coalesce(toCol(condition), lit(false)))
        .select(t.columns.map(col).toSeq: _*))

    case UpdateTable(table, assignments, condition) =>
      val (name, alias) = relName(table)
      val t = alias.foldLeft(resolve(name))(_.alias(_))
      val cond = condition.map(toCol).getOrElse(lit(true))
      val assigned = assignedMap(t, assignments, name, alias)
      val out = t.columns.map { c =>
        assigned.get(c.toLowerCase) match {
          case Some(v) =>
            when(coalesce(cond, lit(false)), v).otherwise(col(c)).as(c)
          case None => col(c)
        }
      }
      (name, t.select(out.toSeq: _*))

    case other => throw new IllegalArgumentException(
      s"unsupported DML statement: ${other.nodeName}")
  }
}
