package graft.scd

import graft.catalog.ParquetCatalog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedIdentifier, UnresolvedRelation}
import org.apache.spark.sql.catalyst.plans.logical.{CreateTableAsSelect, InsertIntoStatement, LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** `CREATE TABLE … AS SELECT` and `INSERT INTO/OVERWRITE … SELECT`
  * front door — the query-driven half of the catalog's DDL/DML verb
  * set ([[DdlSql]] ALTER, [[DmlSql]] DELETE/UPDATE, [[MergeSql]]
  * MERGE). Spark 4 parses each statement natively; the parsed command
  * compiles onto [[ParquetCatalog]]'s atomic publish:
  *
  *   - CTAS publishes the query result as the table's FIRST version
  *     (one publish — `IF NOT EXISTS` on an existing table is a
  *     no-op that returns the current content);
  *   - `INSERT INTO … SELECT` appends under SQL's POSITIONAL
  *     semantics (each query column casts to the target column at
  *     its position); a `(col, …)` list routes query columns to the
  *     NAMED target columns, unnamed ones fill NULL; `BY NAME`
  *     matches case-insensitively and requires the column sets to
  *     agree exactly (a silently-dropped or null-filled column in a
  *     100-TB append is how corpora rot);
  *   - `INSERT OVERWRITE … SELECT` replaces content, same alignment;
  *   - every statement is ONE new catalog version: concurrent readers
  *     keep their snapshot, time travel reads each append boundary.
  *
  * Query resolution is CATALOG-FIRST: every named relation inside the
  * SELECT that exists in the [[ParquetCatalog]] swaps for that
  * table's current snapshot (aliased, so qualified column references
  * keep working); anything else stays for the session analyzer (temp
  * views), so sources can mix catalog tables with registered frames.
  *
  * At 100 TB: CTAS and INSERT write the query result once —
  * partition-local parquet writes, no exchange beyond what the query
  * itself needs; the append's union is by-reference (the old
  * version's files are NOT rewritten — `append` unions lazily and the
  * publish writes only what the plan yields).
  */
object CtasSql {

  private def resolveQuery(spark: SparkSession, catalog: ParquetCatalog,
      q: LogicalPlan): DataFrame = {
    // transformDownWithSubqueries, not transform: plain transform does
    // not descend into expression subqueries (IN/EXISTS/scalar), so a
    // catalog table named only inside one would silently resolve
    // against session temp views instead — breaking the documented
    // "every named relation inside the SELECT" catalog-first contract.
    val swapped = q.transformDownWithSubqueries {
      case r: UnresolvedRelation
          if r.multipartIdentifier.length == 1 &&
            catalog.exists(r.multipartIdentifier.head) =>
        SubqueryAlias(r.multipartIdentifier.head,
          ColumnBridge.logicalPlan(
            catalog.table(r.multipartIdentifier.head)))
    }
    ColumnBridge.ofRows(spark, swapped)
  }

  /** Parse and atomically publish; returns the table's new content. */
  def execute(spark: SparkSession, catalog: ParquetCatalog,
      sql: String): DataFrame =
    spark.sessionState.sqlParser.parsePlan(sql) match {
      case c: CreateTableAsSelect =>
        val name = c.name match {
          case u: UnresolvedIdentifier => u.nameParts.mkString(".")
          case other => throw new IllegalArgumentException(
            "CTAS target must be a named table; got: " + other.nodeName)
        }
        require(c.partitioning.isEmpty,
          "PARTITIONED BY in CTAS is not supported through this door")
        // loud-scope-boundary: every table-spec clause this door does
        // not honor is REJECTED, not ignored — a `USING x LOCATION y`
        // CTAS silently publishing into the catalog root is how data
        // lands in the wrong place at 100 TB.
        c.tableSpec match {
          case s: org.apache.spark.sql.catalyst.plans.logical.TableSpecBase =>
            require(s.provider.isEmpty,
              s"USING ${s.provider.get} in CTAS is not supported " +
                "through this door (the catalog writes parquet)")
            require(s.location.isEmpty,
              s"LOCATION ${s.location.get} in CTAS is not supported " +
                "through this door (the catalog owns table paths)")
            require(s.properties.isEmpty,
              "TBLPROPERTIES in CTAS is not supported through this " +
                s"door: ${s.properties.keys.mkString(",")}")
            require(s.serde.isEmpty,
              "ROW FORMAT/STORED AS in CTAS is not supported through " +
                "this door")
            require(!s.external,
              "EXTERNAL in CTAS is not supported through this door")
            s match {
              case u: org.apache.spark.sql.catalyst.plans.logical.UnresolvedTableSpec =>
                require(u.optionExpression.options.isEmpty,
                  "OPTIONS in CTAS is not supported through this door")
              case _ => ()
            }
        }
        if (catalog.exists(name)) {
          require(c.ignoreIfExists, s"table $name already exists")
          catalog.table(name) // IF NOT EXISTS: no-op
        } else {
          catalog.createAs(name, resolveQuery(spark, catalog, c.query))
          catalog.table(name)
        }

      case i: InsertIntoStatement =>
        val name = i.table match {
          case r: UnresolvedRelation => r.multipartIdentifier.mkString(".")
          case other => throw new IllegalArgumentException(
            "INSERT target must be a named table; got: " + other.nodeName)
        }
        require(catalog.exists(name), s"INSERT target not in catalog: $name")
        require(i.partitionSpec.isEmpty && !i.ifPartitionNotExists,
          "PARTITION clauses are not supported through this door")
        val tf = catalog.table(name).schema.fields
        val src0 = resolveQuery(spark, catalog, i.query)
        // positional references go through unambiguous synthetic names
        // (a SELECT may repeat an output name)
        val src = src0.toDF(src0.columns.indices.map(j => s"__c$j"): _*)
        val aligned =
          if (i.byName) {
            val srcNames = src0.columns.map(_.toLowerCase)
            val tgtNames = tf.map(_.name.toLowerCase)
            require(srcNames.distinct.length == srcNames.length &&
                srcNames.sorted.sameElements(tgtNames.sorted),
              s"INSERT BY NAME requires the exact column set of $name; " +
                s"got ${src0.columns.mkString(",")}")
            src.select(tf.map { f =>
              val j = srcNames.indexOf(f.name.toLowerCase)
              col(s"__c$j").cast(f.dataType).as(f.name)
            }.toSeq: _*)
          } else if (i.userSpecifiedCols.nonEmpty) {
            require(i.userSpecifiedCols.length == src0.columns.length,
              s"INSERT names ${i.userSpecifiedCols.length} columns but " +
                s"the query yields ${src0.columns.length}")
            val named = i.userSpecifiedCols.map(_.toLowerCase)
            named.foreach(n => require(
              tf.exists(_.name.equalsIgnoreCase(n)),
              s"INSERT names unknown column of $name: $n"))
            src.select(tf.map { f =>
              named.indexOf(f.name.toLowerCase) match {
                case -1 => lit(null).cast(f.dataType).as(f.name)
                case j => col(s"__c$j").cast(f.dataType).as(f.name)
              }
            }.toSeq: _*)
          } else {
            require(src0.columns.length == tf.length,
              s"INSERT query yields ${src0.columns.length} columns but " +
                s"$name has ${tf.length}")
            src.select(tf.zipWithIndex.map { case (f, j) =>
              col(s"__c$j").cast(f.dataType).as(f.name)
            }.toSeq: _*)
          }
        if (i.overwrite) catalog.overwrite(name, aligned)
        else catalog.append(name, aligned)
        catalog.table(name)

      case other => throw new IllegalArgumentException(
        "not a CTAS or INSERT … SELECT statement: " + other.nodeName)
    }
}
