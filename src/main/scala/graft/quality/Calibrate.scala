package graft.quality

import graft.text.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-source CALIBRATED quality gating — the fix for the absolute-
  * threshold bug: one global cut (q46's `quality >= 0.7`) over-gates
  * any source whose score distribution sits lower (different language
  * register, different boilerplate shape) and under-gates one sitting
  * higher; real curation pipelines therefore gate each source against
  * its OWN distribution. This keeps each source's top `keepNum/keepDen`
  * fraction by quality — a rank cut, which IS the per-source quantile
  * threshold without ever computing a quantile value (exact for
  * discrete score distributions, where an interpolated percentile is
  * engine-dependent).
  *
  * Exactness: keep iff `(rank − 1) · keepDen < n_src · keepNum`
  * (⇔ rank ≤ ceil(n·num/den)) — pure integer arithmetic; the rank
  * orders by (quality DESC, id ASC), both engine-identical.
  *
  * Scale shape: the per-source rank rides [[graft.operators.TwoPhase
  * .prefixSum]] (range slices + broadcast offsets) — sources are FEW
  * and corpus-sized, exactly the funnel a per-source window would
  * create; the per-source totals are a sources-row broadcast.
  */
object Calibrate {

  /** @return one row per doc: `(idCol, srcCol, quality, src_rank,
    *   n_src, keep)` — `src_rank` dense from 1 within the source by
    *   (quality DESC, id ASC).
    */
  def topFractionBySource(docs: DataFrame, idCol: String, srcCol: String,
      textCol: String, keepNum: Long, keepDen: Long,
      stopwords: Seq[String] = Seq("the", "a", "of", "and", "is"))
      : DataFrame = {
    require(keepNum >= 0 && keepDen > 0, "need 0 <= keepNum, 0 < keepDen")
    val id = col(idCol)
    val src = col(srcCol)
    val scored = docs.select(id, src,
        TextAnalysis.qualityScore(col(textCol), stopwords).as("quality"))
      .withColumn("__negq", -col("quality"))
    val ranked = graft.operators.TwoPhase
      .prefixSum(scored, Seq(srcCol), Seq("__negq", idCol), lit(1L),
        "src_rank")
    val totals = scored.groupBy(src).agg(count(lit(1)).as("n_src"))
    ranked.join(broadcast(totals), Seq(srcCol))
      .withColumn("keep",
        (col("src_rank") - 1L) * keepDen < col("n_src") * keepNum)
      .select(id, src, col("quality"), col("src_rank"), col("n_src"),
        col("keep"))
  }

  /** Per-source RANK BUCKETS over an arbitrary pre-scored relation —
    * the CCNet posture (Wenzek et al. 2020): rather than gate on an
    * absolute score, each source's documents are split into `nBuckets`
    * equal rank bands (head / middle / tail for 3) by its OWN score
    * distribution, and the training mixture later samples the bands at
    * different rates. Bucket assignment is the exact integer
    * `(rank−1)·nBuckets div n_src` — 0 = best band — on a rank ordered
    * by (score DESC, id ASC), so two engines agree on every boundary
    * (an interpolated per-source quantile would not replay).
    *
    * Same scale shape as [[topFractionBySource]]: the per-source rank
    * rides the two-phase prefix sum, totals are a sources-row
    * broadcast — never a source-sized window funnel.
    *
    * @param scored one row per doc with at least (idCol, srcCol,
    *   scoreCol); extra columns pass through un-consulted
    * @return (idCol, srcCol, scoreCol, src_rank, n_src, bucket)
    */
  def rankBucketsBySource(scored: DataFrame, idCol: String,
      srcCol: String, scoreCol: String, nBuckets: Int): DataFrame = {
    require(nBuckets > 0, "need nBuckets > 0")
    val base = scored.select(col(idCol), col(srcCol), col(scoreCol))
    val ranked = graft.operators.TwoPhase.prefixSum(
      base.withColumn("__negs", -col(scoreCol)),
      Seq(srcCol), Seq("__negs", idCol), lit(1L), "src_rank")
    val totals = base.groupBy(col(srcCol)).agg(count(lit(1)).as("n_src"))
    ranked.join(broadcast(totals), Seq(srcCol))
      .withColumn("bucket",
        expr(s"(src_rank - 1) * $nBuckets div n_src"))
      .select(col(idCol), col(srcCol), col(scoreCol), col("src_rank"),
        col("n_src"), col("bucket"))
  }
}
