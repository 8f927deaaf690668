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
      val assigned: Map[String, Column] = assignments.map {
        case Assignment(key, value) =>
          // strip a qualifier matching the alias/table: `SET x.c = e`
          val parts = key.sql.split("\\.")
          val colName = parts.last
          require(t.columns.exists(_.equalsIgnoreCase(colName)),
            s"UPDATE assigns unknown column $colName of $name")
          colName.toLowerCase -> toCol(value)
      }.toMap
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
