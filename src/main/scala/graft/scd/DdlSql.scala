package graft.scd

import graft.catalog.ParquetCatalog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedTable
import org.apache.spark.sql.catalyst.expressions.Cast
import org.apache.spark.sql.catalyst.plans.logical.{AddColumns, AlterColumns, DropColumns, LogicalPlan, RenameColumn}
import org.apache.spark.sql.functions._

/** `ALTER TABLE … ADD/DROP/RENAME COLUMN` front door — schema
  * evolution through [[ParquetCatalog]]'s version chain. [[MergeSql]]
  * already evolves schemas implicitly (source-typed columns append
  * during a MERGE); this is the EXPLICIT DDL surface: Spark 4 parses
  * each statement natively, and the parsed command compiles onto one
  * projection + atomic publish —
  *
  *   - ADD: each added column appends to the schema as NULL (or its
  *     `DEFAULT <literal>` fill) for every existing row;
  *   - DROP: the named columns project away (`IF EXISTS` tolerated);
  *     dropping every column, or a missing column without IF EXISTS,
  *     is rejected loudly;
  *   - RENAME: one column changes name, position and values stable;
  *     renaming onto an existing name is rejected loudly;
  *   - ALTER COLUMN … TYPE: WIDENING-only type evolution (Catalyst's
  *     loss-free up-cast lattice — INT→BIGINT, FLOAT→DOUBLE, decimal
  *     growth); narrowing or cross-family changes are rejected loudly
  *     (a silently-truncating 100-TB rewrite is the disallowed case);
  *   - every altered table is the NEXT catalog version: concurrent
  *     readers keep their snapshot, and time travel reads every
  *     pre-alter version under its ORIGINAL schema (the boundary
  *     q236/q282 cross);
  *   - nested paths (`col.field`) and `FIRST`/`AFTER` positions are
  *     rejected loudly — the engine's tables are flat and
  *     column-order-stable.
  *
  * At 100 TB each rewrite is one scan + projection with zero
  * exchanges (partition-local writes), same as [[DmlSql]]'s
  * copy-on-write posture; DROP/RENAME never touch data bytes at all
  * beyond the column-pruned copy.
  */
object DdlSql {

  private def tableName(table: LogicalPlan): String = table match {
    case t: UnresolvedTable => t.multipartIdentifier.mkString(".")
    case other => throw new IllegalArgumentException(
      "ALTER TABLE target must be a named table; got: " + other.nodeName)
  }

  private def load(catalog: ParquetCatalog, name: String): DataFrame = {
    require(catalog.exists(name),
      s"ALTER TABLE target not in catalog: $name")
    catalog.table(name)
  }

  /** Parse and atomically publish; returns the altered content. */
  def execute(spark: SparkSession, catalog: ParquetCatalog,
      sql: String): DataFrame =
    spark.sessionState.sqlParser.parsePlan(sql) match {
      case AddColumns(table, cols) =>
        val name = tableName(table)
        val t = load(catalog, name)
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

      case DropColumns(table, cols, ifExists) =>
        val name = tableName(table)
        val t = load(catalog, name)
        val toDrop = cols.map { f =>
          require(f.name.length == 1,
            s"nested DROP COLUMN is not supported: ${f.name.mkString(".")}")
          f.name.head
        }
        val missing = toDrop.filterNot(d =>
          t.columns.exists(_.equalsIgnoreCase(d)))
        require(ifExists || missing.isEmpty,
          s"DROP COLUMN: no such column(s) in $name: " +
            missing.mkString(", "))
        val keep = t.columns.filterNot(c =>
          toDrop.exists(_.equalsIgnoreCase(c)))
        require(keep.nonEmpty,
          s"DROP COLUMN would remove every column of $name")
        if (keep.length == t.columns.length) t // IF EXISTS, all missing
        else {
          catalog.overwrite(name, t.select(keep.map(col): _*))
          catalog.table(name)
        }

      case AlterColumns(table, specs) =>
        val name = tableName(table)
        val t = load(catalog, name)
        val widened = specs.foldLeft(t) { (df, sp) =>
          require(sp.column.name.length == 1,
            "nested ALTER COLUMN is not supported: " +
              sp.column.name.mkString("."))
          val cn = sp.column.name.head
          val actual = df.columns.find(_.equalsIgnoreCase(cn))
            .getOrElse(throw new IllegalArgumentException(
              s"ALTER COLUMN: no such column in $name: $cn"))
          require(sp.newPosition.isEmpty,
            s"FIRST/AFTER position is not supported: $cn")
          require(sp.newNullability.isEmpty && sp.newComment.isEmpty &&
            sp.newDefaultExpression.isEmpty,
            s"only TYPE changes are supported for $cn")
          val to = sp.newDataType.getOrElse(
            throw new IllegalArgumentException(
              s"ALTER COLUMN $cn must specify TYPE"))
          val from = df.schema(actual).dataType
          // WIDENING only (Catalyst's loss-free up-cast lattice:
          // INT→BIGINT, FLOAT→DOUBLE, decimal growth, …): a narrowing
          // rewrite silently truncating 100 TB is the disallowed case.
          // String targets are excluded on top of canUpCast — every
          // atomic type up-casts to STRING loss-free, but a numeric
          // column silently becoming text is a family change the
          // table-format precedents (Delta/Iceberg) also reject.
          require(from != to &&
            to != org.apache.spark.sql.types.StringType &&
            Cast.canUpCast(from, to),
            s"only widening type changes are supported for $cn: " +
              s"${from.simpleString} -> ${to.simpleString}")
          // withColumn replaces in place — position and values stable
          df.withColumn(actual, col(actual).cast(to))
        }
        catalog.overwrite(name, widened)
        catalog.table(name)

      case RenameColumn(table, column, newName) =>
        val name = tableName(table)
        val t = load(catalog, name)
        require(column.name.length == 1,
          s"nested RENAME COLUMN is not supported: " +
            column.name.mkString("."))
        val from = column.name.head
        require(t.columns.exists(_.equalsIgnoreCase(from)),
          s"RENAME COLUMN: no such column in $name: $from")
        require(!t.columns.exists(_.equalsIgnoreCase(newName)),
          s"RENAME COLUMN target already exists in $name: $newName")
        catalog.overwrite(name, t.withColumnRenamed(from, newName))
        catalog.table(name)

      case other => throw new IllegalArgumentException(
        s"not a supported ALTER TABLE statement: ${other.nodeName}")
    }
}
