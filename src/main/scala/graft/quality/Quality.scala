package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations over a DataFrame — the
  * constraint-checking stage of an ETL pipeline (dbt tests / Delta
  * constraints / Deequ's verification suite, re-expressed Spark-first).
  *
  * Every rule compiles to ONE aggregate over the scanned relation;
  * [[report]] unions the per-rule counts, so the whole suite is a
  * handful of scans Catalyst can share column pruning across — no
  * row-level materialization of violations unless [[violatingRows]] is
  * asked for a specific rule.
  */
object Quality {

  sealed trait Rule { def name: String }

  /** Column must never be NULL. */
  final case class NotNull(col: String) extends Rule {
    def name = s"not_null($col)"
  }

  /** Column combination must be unique. */
  final case class Unique(cols: Seq[String]) extends Rule {
    def name = s"unique(${cols.mkString(",")})"
  }

  /** Value must fall in [lo, hi] (NULLs do not violate — compose with
    * [[NotNull]] for that).
    */
  final case class InRange(col: String, lo: Double, hi: Double) extends Rule {
    def name = s"in_range($col,$lo,$hi)"
  }

  /** Every (non-null) foreign key must exist in `pk` of `dim`. */
  final case class RefIntegrity(fk: String, dim: DataFrame, pk: String)
      extends Rule {
    def name = s"ref_integrity($fk)"
  }

  /** Rows matching `predicate` are violations. */
  final case class Custom(name: String, predicate: Column) extends Rule

  /** Violation count per rule, one output row per rule (rules with zero
    * violations still appear — an absent check and a passing check must
    * not look alike).
    *
    * All scalar rules (not-null / unique / range / custom) FUSE into one
    * aggregate over one scan — at 100 TB the suite costs one pass
    * regardless of rule count — then unpivot to (rule, count) rows.
    * Only ref-integrity rules need their own anti-join subplan each.
    */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    val indexed = rules.zipWithIndex
    val (refRules, scalarRules) =
      indexed.partition(_._1.isInstanceOf[RefIntegrity])
    val scalarPart = if (scalarRules.isEmpty) Nil else {
      val aggs = scalarRules.map { case (r, i) =>
        val e = r match {
          case NotNull(c) => count(when(col(c).isNull, 1))
          case Unique(cs) =>
            count(lit(1)) - count_distinct(struct(cs.map(col): _*))
          case InRange(c, lo, hi) =>
            count(when(col(c) < lo || col(c) > hi, 1))
          case Custom(_, pred) => count(when(pred, 1))
          case _: RefIntegrity =>
            throw new IllegalStateException("partitioned out")
        }
        e.cast("long").as(s"__v$i")
      }
      val one = df.agg(aggs.head, aggs.tail: _*)
      Seq(one.select(explode(array(scalarRules.map {
        case (r, i) => struct(lit(i).as("idx"), lit(r.name).as("rule"),
          col(s"__v$i").as("n_violations"))
      }: _*)).as("kv")).select(col("kv.idx"), col("kv.rule"),
        col("kv.n_violations")))
    }
    val refPart = refRules.collect { case (r @ RefIntegrity(fk, dim, pk), i) =>
      df.filter(col(fk).isNotNull)
        .join(dim.select(col(pk)), col(fk) === col(pk), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit(i).as("idx"), lit(r.name).as("rule"),
          col("n_violations"))
    }
    // rows come back in the caller's rule order, scalar and ref-integrity
    // rules interleaved as declared (the fused-aggregate split is an
    // implementation detail consumers must not see). The result is one
    // row per RULE — coalesce(1) + local sort gives a total order without
    // the range-partitioning exchange (and its sampling job) a global
    // orderBy would plan on a ~rule-count-sized relation.
    (scalarPart ++ refPart).reduce(_ unionByName _)
      .coalesce(1).sortWithinPartitions(col("idx")).drop("idx")
  }

  /** The rows violating ONE rule (for triage; unbounded output, so it is
    * deliberately per-rule rather than suite-wide).
    */
  def violatingRows(df: DataFrame, rule: Rule): DataFrame = rule match {
    case NotNull(c) => df.filter(col(c).isNull)
    case Unique(cs) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(cs.map(col): _*)
      df.withColumn("__n", count(lit(1)).over(w))
        .filter(col("__n") > 1).drop("__n")
    case InRange(c, lo, hi) => df.filter(col(c) < lo || col(c) > hi)
    case RefIntegrity(fk, dim, pk) =>
      df.filter(col(fk).isNotNull)
        .join(dim.select(col(pk)), col(fk) === col(pk), "left_anti")
    case Custom(_, pred) => df.filter(pred)
  }
}
