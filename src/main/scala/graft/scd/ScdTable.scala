package graft.scd

import java.sql.Timestamp

import graft.catalog.ParquetCatalog
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The user-facing dimension-table abstraction: an SCD Type-1/Type-2
  * dimension bound to a catalog table, with merge-and-publish, current /
  * historical / point-in-time reads, and the as-of fact join the
  * dimension exists to serve.
  *
  * This is the complete replacement for the reference's workflow: where
  * the reference user runs the 8-statement script against Hive
  * (`SCD_script.txt`), this user calls `dim.apply(staging, asOf)` — one
  * atomic versioned publish, deterministic keys, gapless intervals.
  */
final class ScdTable(
    val catalog: ParquetCatalog,
    val name: String,
    val schema: ScdSchema) {

  /** Create (or replace) the dimension with initial content. */
  def init(production: DataFrame): Unit = {
    if (!catalog.exists(name)) catalog.create(name, production.schema)
    catalog.overwrite(name, production)
  }

  /** Current committed snapshot (all versions, active + history). */
  def snapshot: DataFrame = catalog.table(name)

  /** Only the active (current-version) rows. */
  def active: DataFrame = snapshot.filter(col(schema.activeCol))

  /** Rows whose validity interval contains `ts` (point-in-time view). */
  def asOf(ts: Timestamp): DataFrame =
    snapshot.filter(col(schema.startCol) <= lit(ts) &&
      col(schema.endCol) > lit(ts))

  /** Merge a staging snapshot and atomically publish the result. */
  def apply(staging: DataFrame, opts: MergeOptions): Unit =
    catalog.overwrite(name,
      ScdMerge.merge(snapshot, staging, schema, opts))

  def apply(staging: DataFrame, asOf: Timestamp): Unit =
    apply(staging, MergeOptions(asOf))

  /** As-of join: resolve each fact row against the dimension version
    * valid at the fact's timestamp. Equi-join on the business key carries
    * the shuffle; the interval predicate filters post-join — one
    * key-partitioned join, no cross product (SURVEY.md §2.2 "as-of").
    */
  def asOfJoin(
      facts: DataFrame,
      factKeys: Seq[String],
      factTimeCol: String): DataFrame = {
    val dim = snapshot // one instance: column refs must share attribute ids
    val keyCond = schema.businessKeys.zip(factKeys)
      .map { case (dk, fk) => dim(dk) === facts(fk) }
      .reduce(_ && _)
    val interval = facts(factTimeCol) >= dim(schema.startCol) &&
      facts(factTimeCol) < dim(schema.endCol)
    facts.join(dim, keyCond && interval, "left_outer")
  }

  /** [[asOfJoin]] through the native as-of operator
    * ([[graft.plans.AsOfJoin]]): backward as-of on `scd_start_date`.
    * Equivalent to the interval formulation whenever the dimension's
    * intervals are contiguous and every member's last version is open —
    * which this engine's merge guarantees — but with O(n+m) per
    * partition instead of versions-per-key row amplification.
    */
  def asOfJoinNative(
      facts: DataFrame,
      factKeys: Seq[String],
      factTimeCol: String): DataFrame = {
    val dim = snapshot
    graft.plans.AsOfJoin.backward(facts, dim,
      factKeys.map(facts(_)), schema.businessKeys.map(dim(_)),
      facts(factTimeCol), dim(schema.startCol))
  }
}
