package graft.quality

import graft.text.{TextAnalysis, TextClassify}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-source DISTRIBUTION DRIFT between two corpus snapshots — the
  * monitoring pass a continuously-ingested training corpus runs before
  * re-release: "which sources changed what they're made of since the
  * last snapshot?" (a crawler losing a site section, a wire format
  * change flooding boilerplate, an upstream filter silently loosening).
  *
  * Signal: each (source, snapshot) side reduces to a hashed
  * unigram+bigram bucket histogram (the [[graft.pipeline.Dsir]]
  * feature space — features are features), normalized to EXACT integer
  * parts-per-million proportions `p_b = c_b·10⁶ div N`, and the drift
  * score is the squared L2 distance `Σ_b (pA_b − pB_b)²` between the
  * two ppm histograms. Everything is exact integer arithmetic with
  * every quotient a nonnegative `div` (== DuckDB `//`), so the score
  * replays bit-identically (q163) — and every term is bounded at ANY
  * corpus size: ppm values ≤ 10⁶, squared deviations ≤ 10¹², the
  * per-source sum ≤ dim·10¹² — where a chi-square cross-product
  * `cA·NB` would overflow int64 on corpus-scale counts.
  *
  * Shape: two tokenize+explode scans into map-side-combinable
  * (source, bucket) counts — the bigram window partitions per DOC
  * (bounded), never per source; the joined histogram relation is at
  * most `sources × dim` rows. Nothing else shuffles.
  */
object Drift {

  /** Ppm proportion scale (10⁶ — one part per million). */
  val Unit = 1000000L

  /** The (srcCol, bucket, n) histogram relation of one snapshot side.
    * Counts are per-OCCURRENCE quantities (the bigram window partitions
    * per doc), so partial histograms over any batching of the corpus
    * ADD to the one-shot histogram — the mergeable-partials contract
    * (the q122 HistSketch argument), which is what lets the streaming
    * door ([[graft.streaming.StreamingDrift]]) fold batches.
    */
  def bucketCounts(d: DataFrame, idCol: String, srcCol: String,
      textCol: String, dim: Int = 256): DataFrame = {
    val src = col(srcCol)
    val toks = d.select(src, col(idCol),
      posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos", "tok")))
    val uni = toks.select(src, col("tok").as("feat"))
    val bi = toks
      .withColumn("nxt", lead(col("tok"), 1)
        .over(Window.partitionBy(col(idCol)).orderBy(col("pos"))))
      .filter(col("nxt").isNotNull)
      .select(src, concat_ws(" ", col("tok"), col("nxt")).as("feat"))
    uni.unionByName(bi)
      .select(src, TextClassify.bucket(col("feat"), dim).as("bucket"))
      .groupBy(src, col("bucket")).agg(count(lit(1)).as("n"))
  }

  /** Drift report for every source present in BOTH snapshots:
    * `(srcCol, n_a, n_b, drift)` with `n_a`/`n_b` the side's feature
    * occurrence totals and `drift` the squared ppm-histogram L2
    * distance (0 = identical distributions; an identical corpus on
    * both sides scores exactly 0 by construction).
    */
  def sourceDrift(a: DataFrame, b: DataFrame, idCol: String,
      srcCol: String, textCol: String, dim: Int = 256): DataFrame =
    fromCounts(bucketCounts(a, idCol, srcCol, textCol, dim),
      bucketCounts(b, idCol, srcCol, textCol, dim), srcCol)

  /** The report tail over two prebuilt [[bucketCounts]] relations —
    * the entry point for stored/streamed partials.
    */
  def fromCounts(histA: DataFrame, histB: DataFrame,
      srcCol: String): DataFrame = {
    val src = col(srcCol)
    // the joined relations often descend from one base plan (callers
    // pass two filters of one snapshot) — rename each side's key
    // columns to fresh attributes before joining, keeping every join
    // condition unambiguous under Spark's self-join attribute dedup
    val ca = histA.select(src, col("bucket"), col("n").as("ca"))
    val cb = histB
      .select(src.as("__db"), col("bucket").as("__bb"),
        col("n").as("cb"))
    val ta = ca.groupBy(src.as("__da")).agg(sum(col("ca")).as("n_a"))
    val tb = cb.groupBy(col("__db").as("__dt"))
      .agg(sum(col("cb")).as("n_b"))
    ca.join(cb, src === col("__db") && col("bucket") === col("__bb"),
        "full_outer")
      .select(coalesce(src, col("__db")).as("__src"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
      .join(ta, col("__src") === col("__da"))
      .join(tb, col("__src") === col("__dt"))
      .withColumn("pa", expr(s"(ca * $Unit) div n_a"))
      .withColumn("pb", expr(s"(cb * $Unit) div n_b"))
      .withColumn("dev", col("pa") - col("pb"))
      .groupBy(col("__src"), col("n_a"), col("n_b"))
      .agg(sum(col("dev") * col("dev")).as("drift"))
      .select(col("__src").as(srcCol), col("n_a"), col("n_b"),
        col("drift"))
  }
}
