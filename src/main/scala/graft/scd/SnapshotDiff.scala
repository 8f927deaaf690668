package graft.scd

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-capture from full snapshots: diff two snapshots of the
  * same relation into an (op, key, values) change feed — `insert` /
  * `delete` / `update` — the input an incremental SCD pipeline needs
  * when the upstream can only hand over full extracts (the reference's
  * staging table IS such an extract; this closes the loop from raw
  * snapshots to the merge).
  *
  * One full-outer join keyed on the business key; comparison is
  * null-safe per column (a NULL→value transition IS an update). At
  * scale this is the same single-shuffle shape as the merge itself.
  */
object SnapshotDiff {

  /** @param compareCols columns whose change constitutes an `update`
    *   (defaults to every non-key column of `next`).
    */
  def diff(prev: DataFrame, next: DataFrame, keys: Seq[String],
      compareCols: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "at least one key column")
    val valueCols =
      if (compareCols.nonEmpty) compareCols
      else next.columns.filterNot(keys.contains).toSeq
    val P = "__prev_"; val N = "__next_"
    val p = prev.select((keys ++ valueCols)
      .map(c => col(c).as(P + c)) :+ lit(true).as(P + "present"): _*)
    val n = next.select((keys ++ valueCols)
      .map(c => col(c).as(N + c)) :+ lit(true).as(N + "present"): _*)
    val joined = p.join(n,
      keys.map(k => col(P + k) === col(N + k)).reduce(_ && _), "full_outer")
    val pPresent = coalesce(col(P + "present"), lit(false))
    val nPresent = coalesce(col(N + "present"), lit(false))
    val changed: Column = valueCols
      .map(c => !(col(P + c) <=> col(N + c)))
      .reduceOption(_ || _).getOrElse(lit(false))
    val op = when(!pPresent, lit("insert"))
      .when(!nPresent, lit("delete"))
      .when(changed, lit("update"))
      .otherwise(lit(null))
    joined
      .withColumn("op", op)
      .filter(col("op").isNotNull)
      .select(col("op") +:
        keys.map(k => coalesce(col(P + k), col(N + k)).as(k)) ++:
        valueCols.map(c =>
          when(col("op") === "delete", col(P + c)).otherwise(col(N + c))
            .as(c)): _*)
  }
}
