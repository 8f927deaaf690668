package graft.scd

import graft.catalog.ParquetCatalog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedTable
import org.apache.spark.sql.catalyst.plans.logical.AddColumns
import org.apache.spark.sql.functions._

/** `ALTER TABLE … ADD COLUMN(S)` front door — schema evolution
  * through [[ParquetCatalog]]'s version chain. [[MergeSql]] already
  * evolves schemas implicitly (source-typed columns append during a
  * MERGE); this is the EXPLICIT DDL surface: Spark 4 parses the
  * statement natively, and the parsed [[AddColumns]] compiles onto
  * one projection + atomic publish —
  *
  *   - each added column appends to the schema as NULL (or its
  *     `DEFAULT <literal>` fill) for every existing row;
  *   - the widened table is the NEXT catalog version: concurrent
  *     readers keep their snapshot, and time travel reads every
  *     pre-alter version under its ORIGINAL schema (the boundary
  *     q236 crosses);
  *   - nested paths (`ADD COLUMN s.f`) and `FIRST`/`AFTER` positions
  *     are rejected loudly — the engine's tables are flat and
  *     column-order-stable.
  *
  * At 100 TB the rewrite is one scan + projection with zero
  * exchanges (partition-local writes), same as [[DmlSql]]'s
  * copy-on-write posture.
  */
object DdlSql {

  /** Parse and atomically publish; returns the widened content. */
  def execute(spark: SparkSession, catalog: ParquetCatalog,
      sql: String): DataFrame =
    spark.sessionState.sqlParser.parsePlan(sql) match {
      case AddColumns(table, cols) =>
        val name = table match {
          case t: UnresolvedTable => t.multipartIdentifier.mkString(".")
          case other => throw new IllegalArgumentException(
            "ALTER TABLE target must be a named table; got: " +
              other.nodeName)
        }
        require(catalog.exists(name),
          s"ALTER TABLE target not in catalog: $name")
        val t = catalog.table(name)
        val widened = cols.foldLeft(t) { (df, c) =>
          require(c.path.isEmpty,
            s"nested ADD COLUMN is not supported: ${c.name.mkString(".")}")
          require(c.position.isEmpty,
            s"FIRST/AFTER position is not supported: ${c.colName}")
          require(!df.columns.exists(_.equalsIgnoreCase(c.colName)),
            s"column ${c.colName} already exists in $name")
          val fill = c.default match {
            case Some(d) => expr(d.child.sql).cast(c.dataType)
            case None => lit(null).cast(c.dataType)
          }
          df.withColumn(c.colName, fill)
        }
        catalog.overwrite(name, widened)
        catalog.table(name)
      case other => throw new IllegalArgumentException(
        s"not an ALTER TABLE ADD COLUMN statement: ${other.nodeName}")
    }
}
