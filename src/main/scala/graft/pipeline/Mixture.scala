package graft.pipeline

import graft.functions.PortableHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic mixture sampling: downsample each corpus source to a
  * target weight — the step that turns N crawled/curated sources into
  * the training mixture (web 60%, code 20%, ... at whatever rates the
  * ablations chose).
  *
  * Membership is a pure function of the row id: keep a row iff
  * `md5-hash(id) mod unit < weight * unit` — no RNG state, no
  * shuffling, embarrassingly parallel, and REPRODUCIBLE: the same row
  * set comes back on every run, on any cluster layout, and in the
  * DuckDB oracle (q93). Weights are expressed in integer parts per
  * `Unit` so the comparison is exact integer arithmetic.
  */
object Mixture {

  /** Parts-per-unit denominator for sampling thresholds. */
  val Unit = 1000000L

  /** Keep predicate: deterministic hash-gate at `threshold` parts per
    * [[Unit]] on `id`.
    */
  def keepExpr(id: Column, threshold: Column): Column =
    PortableHash.hash60Base(id.cast("string")) % Unit < threshold

  /** Temperature-based mixture thresholds at alpha = 1/2: source `s`
    * is allocated `targetRows * sqrt(n_s) / Σ sqrt(n_t)` of the budget
    * (the classic up-weighting of small high-quality sources relative
    * to proportional sampling), converted to a per-row hash-gate
    * threshold `min(Unit, floor(rate * Unit))`.
    *
    * alpha = 1/2 specifically because `sqrt` is IEEE-correctly-rounded
    * — unlike `pow(x, alpha)`, whose libm low bits differ across
    * engines — and the normalizer folds in source-name order from 0.0,
    * so every double op replays bit-identically in the oracle (q134).
    * Counts arrive as a driver-side Seq: one row per SOURCE, the same
    * bounded-state shape as the centroid matrices.
    */
  def temperatureThresholds(counts: Seq[(String, Long)],
      targetRows: Long): Map[String, Long] = {
    require(counts.nonEmpty && counts.forall(_._2 > 0), "positive counts")
    val sorted = counts.sortBy(_._1)
    val w = sorted.foldLeft(0.0) { case (acc, (_, n)) =>
      acc + math.sqrt(n.toDouble)
    }
    sorted.map { case (s, n) =>
      val rate =
        ((targetRows.toDouble * math.sqrt(n.toDouble)) / w) / n.toDouble
      s -> math.min(Unit, math.floor(rate * Unit.toDouble).toLong)
    }.toMap
  }

  /** Downsample `docs` so source `s` survives at `thresholds(s)` parts
    * per [[Unit]] (absent sources drop to `defaultThreshold`). Returns
    * the surviving rows unchanged plus the `threshold` column that
    * admitted them.
    */
  def sample(docs: DataFrame, idCol: String, srcCol: String,
      thresholds: Map[String, Long],
      defaultThreshold: Long = 0L): DataFrame = {
    val th = thresholds.foldLeft(lit(defaultThreshold)) {
      case (acc, (s, t)) => when(col(srcCol) === s, lit(t)).otherwise(acc)
    }
    docs.withColumn("threshold", th)
      .filter(keepExpr(col(idCol), col("threshold")))
  }

  /** CCNet-style BAND-WEIGHTED sampling — the step the per-source rank
    * buckets ([[graft.quality.Calibrate.rankBucketsBySource]]) exist to
    * feed: band b survives at `weightsPpm(b)` parts per [[Unit]] (the
    * classic head 100% / middle 50% / tail 10% posture). Buckets
    * outside the weight list drop to 0. Same determinism contract as
    * [[sample]]: membership is a pure integer function of the row id,
    * reproducible on any layout and in the oracle (q194).
    */
  def sampleByBucket(rows: DataFrame, idCol: String, bucketCol: String,
      weightsPpm: Seq[Long]): DataFrame = {
    require(weightsPpm.nonEmpty &&
      weightsPpm.forall(w => w >= 0 && w <= Unit),
      s"weights in [0, $Unit]")
    val th = weightsPpm.zipWithIndex.foldLeft(lit(0L)) {
      case (acc, (w, b)) =>
        when(col(bucketCol) === b.toLong, lit(w)).otherwise(acc)
    }
    rows.withColumn("threshold", th)
      .filter(keepExpr(col(idCol), col("threshold")))
  }

  /** UPSAMPLE: the other half of mixture construction — sources whose
    * ablated rate EXCEEDS one epoch (weight > [[Unit]] parts per unit,
    * e.g. 2 500 000 = repeat 2.5x). Every row emits
    * `floor(weight / Unit)` full copies plus one more iff the
    * fractional hash gate admits it, each copy tagged `rep` 0..k-1 so
    * downstream epoch sharding can spread the repeats. The fractional
    * gate is salted ("up:" prefix) so it is independent of the
    * DOWNSAMPLE gate on the same ids — a source at weight 0.3 here is
    * a different (but equally deterministic) row set than
    * [[sample]] at threshold 300 000. Same portability contract as
    * [[sample]]: membership and copy count are pure integer functions
    * of the row id, reproducible on any layout and in the DuckDB
    * oracle (q142).
    */
  def upsample(docs: DataFrame, idCol: String, weight: Column): DataFrame = {
    // exact integer floor/mod: (w - w%U)/U divides a multiple of U, so
    // the double division is exact and the long cast loses nothing
    val full = ((weight - pmod(weight, lit(Unit))) / lit(Unit)).cast("long")
    val frac = pmod(weight, lit(Unit))
    val gate = PortableHash.hash60Base(
      concat_ws(":", lit("up"), col(idCol).cast("string"))) % Unit < frac
    val n = full + when(gate, lit(1L)).otherwise(lit(0L))
    docs.withColumn("__n_copies", n)
      .filter(col("__n_copies") > 0)
      .select(docs.columns.map(col).toSeq :+
        explode(sequence(lit(0L), col("__n_copies") - 1)).as("rep"): _*)
  }
}
