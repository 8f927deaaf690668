package graft.scd

import java.sql.Timestamp

/** Column-role declaration for an SCD Type-1/Type-2 dimension.
  *
  * Mirrors the column roles of the reference pipeline
  * (reference `README.md:38-52`; roles inferred in SURVEY.md §1.1):
  * business key joins everything, Type-1 columns are overwritten into all
  * history, Type-2 columns are versioned, plus 4 bookkeeping columns and a
  * surrogate key.
  */
final case class ScdSchema(
    businessKeys: Seq[String],
    type1Cols: Seq[String],
    type2Cols: Seq[String],
    surrogateCol: String = "dim_id",
    versionCol: String = "scd_version",
    startCol: String = "scd_start_date",
    endCol: String = "scd_end_date",
    activeCol: String = "scd_active") {
  require(businessKeys.nonEmpty, "at least one business key column")
  require(type2Cols.nonEmpty, "at least one Type-2 column")

  /** Columns expected on the staging (source snapshot) side. */
  def stagingCols: Seq[String] = businessKeys ++ type1Cols ++ type2Cols

  /** Bookkeeping columns maintained by the engine. */
  def scdCols: Seq[String] = Seq(versionCol, startCol, endCol, activeCol)
}

/** Surrogate-key assignment policy (SURVEY.md §2.3(4), §7.4). */
sealed trait KeyMode
object KeyMode {

  /** Keep existing surrogate keys; new rows get `max(existing) + rank` with a
    * deterministic total order over (businessKeys, version). This is the
    * engine's default — unlike the reference, keys are stable across runs.
    */
  case object Stable extends KeyMode

  /** Reference-shaped: renumber EVERY row with a global `row_number()` ordered
    * by `scd_start_date` (reference `SCD_script.txt:143`), made deterministic
    * with a (start, businessKeys, version) total tiebreak. Single-partition
    * global sort — provided for oracle-diff parity only, not for scale.
    */
  case object HiveCompat extends KeyMode
}

/** Options for one merge run.
  *
  * @param asOf single validity timestamp for the whole merge. The reference
  *   calls `current_timestamp()` per statement and therefore produces gaps
  *   between `scd_end_date(v)` and `scd_start_date(v+1)` (reference
  *   `Hive 2.md:302-306`); a single injected instant makes intervals gapless
  *   and runs reproducible (SURVEY.md §2.3(5)).
  * @param nullSafeCompare when true (default) Type-2 change detection uses
  *   null-safe equality (`<=>`) on every compared column, fixing the
  *   reference's NULL black-hole (SURVEY.md §2.3(3)). When false, plain
  *   `=`/`!=` three-valued logic is used, replicating the reference bug:
  *   an active matched row with NULL on either side of a non-coalesced
  *   Type-2 column matches no branch and disappears.
  * @param coalesceCompareCols only meaningful with nullSafeCompare=false:
  *   columns compared through `COALESCE(c,'')` as the reference does for
  *   `phone` (reference `SCD_script.txt:56,80,116`).
  * @param highDate open-interval sentinel (reference `SCD_script.txt:99,133`).
  * @param closeMissing when true, `staging` is declared a FULL snapshot:
  *   an ACTIVE dimension row whose business key is absent from staging is
  *   a detected DELETE and gets closed (end=asOf, active=false) instead of
  *   carried open forever — the reference's documented blind spot
  *   (SURVEY.md §2.3(6)): its pipeline has no delete branch at all, so
  *   departed members stay active. Historical (already-closed) rows are
  *   carried verbatim either way. Leave false for partial/delta feeds,
  *   where absence means "unchanged", or diff full extracts with
  *   [[SnapshotDiff]] first and feed only the changes.
  */
final case class MergeOptions(
    asOf: Timestamp,
    keyMode: KeyMode = KeyMode.Stable,
    nullSafeCompare: Boolean = true,
    coalesceCompareCols: Set[String] = Set.empty,
    highDate: Timestamp = Timestamp.valueOf("9999-12-31 23:59:59"),
    closeMissing: Boolean = false)
