package graft.pipeline

import graft.functions.PortableHash
import graft.text.{TextAnalysis, TextClassify}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data Selection with Importance Resampling (DSIR, Xie et al. 2023),
  * in exact integer arithmetic: score every raw document by how much
  * its hashed n-gram distribution looks like a TARGET corpus rather
  * than the raw corpus, then keep rows with probability proportional
  * to that importance — the principled replacement for a binary
  * quality gate when the goal is "make the mixture look like the
  * target", not "drop the bad rows".
  *
  * Faithful to the paper's structure — hashed bag of unigrams+bigrams
  * as the feature space, per-feature target/raw likelihood ratios,
  * per-document products turned into sampling probabilities — but
  * computed portably: the log-likelihood sum is replaced by a
  * per-feature SCALED INTEGER ratio `floor((t_b+1)·2^20 / (r_b+1))`
  * (clamped at 64·2^20 so every downstream product stays in int64)
  * and the document score is the exact integer MEAN ratio over its
  * feature occurrences. Monotone in the paper's quantity for the
  * regimes that matter; bit-replayable in DuckDB (q154), where
  * libm `log`/`exp` would not be.
  *
  * Sampling is [[Mixture]]'s deterministic hash-gate: keep a row iff
  * `md5("dsir:"||id) mod Unit < threshold(doc)` with
  * `threshold = min(Unit, keepPpm · imp / mean_imp)` — expected keep
  * rate ≈ `keepPpm`, importance-proportional, reproducible on any
  * layout, and every term bounded: `keepPpm ≤ 10^6`, `imp ≤ 2^26`, so
  * `keepPpm · imp · Unit` never approaches 2^63 at ANY corpus size.
  *
  * Scale shape: two tokenize+explode scans (raw + target) into
  * map-side-combinable per-bucket counts; the ratio table is `dim`
  * rows — broadcast; scoring is one more scan joined against it; the
  * normalizer is a single 1-row aggregate. Nothing shuffles but
  * doc-keyed partial sums — the [[graft.text.TextClassify]] dataflow
  * with a second corpus supplying the weights.
  */
object Dsir {

  /** Fixed-point scale of the per-bucket ratio (2^20 ≈ one "ppm-ish"
    * unit; power of two so the clamp bound reads in bits).
    */
  val Scale = 1L << 20

  /** Ratio clamp: `imp ≤ 64·Scale = 2^26` keeps
    * `keepPpm · imp · Unit < 2^63` with room to spare.
    */
  val RatioCap: Long = Scale * 64

  /** Hash-gate salt — independent of the [[Mixture]] sample gates on
    * the same ids.
    */
  val GateSalt = "dsir:"

  /** Exact `floor(a / b)` on nonnegative longs via SQL `div`
    * (integral division — exact at ANY int64 magnitude, unlike the
    * subtract-mod-then-double-divide idiom whose quotient must stay
    * under 2^53; corpus-sized importance sums don't). Operands must be
    * resolvable column names, so call sites stage them with
    * `withColumn` first.
    */
  private def idivExpr(num: String, den: String): Column =
    expr(s"$num div $den")

  /** Hashed feature stream: one row per unigram and bigram OCCURRENCE,
    * bucketed into `dim` by the [[TextClassify.bucket]] hash (same
    * space as the classifier gate — features are features).
    */
  private[pipeline] def features(docs: DataFrame, idCol: String,
      textCol: String, dim: Int): DataFrame = {
    val toks = docs.select(col(idCol),
      posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos", "tok")))
    val uni = toks.select(col(idCol), col("tok").as("feat"))
    val bi = toks
      .withColumn("nxt", lead(col("tok"), 1)
        .over(Window.partitionBy(col(idCol)).orderBy(col("pos"))))
      .filter(col("nxt").isNotNull)
      .select(col(idCol), concat_ws(" ", col("tok"), col("nxt")).as("feat"))
    uni.unionByName(bi)
      .select(col(idCol), TextClassify.bucket(col("feat"), dim).as("bucket"))
  }

  /** The dense `dim`-row ratio table: bucket →
    * `min(RatioCap, (t_b+1)·Scale / (r_b+1))` with `t_b`/`r_b` the
    * bucket's occurrence counts in the target/raw corpus (+1
    * smoothing: unseen-in-raw features can't blow up, unseen-in-target
    * features score low but nonzero).
    */
  def bucketRatios(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, dim: Int): DataFrame = {
    val spark = raw.sparkSession
    def counts(docs: DataFrame, as: String) =
      features(docs, idCol, textCol, dim)
        .groupBy(col("bucket")).agg(count(lit(1)).as(as))
    spark.range(dim).select(col("id").as("bucket"))
      .join(counts(raw, "__rn"), Seq("bucket"), "left")
      .join(counts(target, "__tn"), Seq("bucket"), "left")
      .withColumn("__num", (coalesce(col("__tn"), lit(0L)) + 1L) * Scale)
      .withColumn("__den", coalesce(col("__rn"), lit(0L)) + 1L)
      .select(col("bucket"),
        least(lit(RatioCap), idivExpr("__num", "__den")).as("ratio"))
  }

  /** Per-document importance: `(id, n_feats, imp)` with
    * `imp = floor(Σ_occurrences ratio(bucket) / n_feats)` — the exact
    * integer mean ratio (length-normalized, so long documents aren't
    * favored by feature count alone).
    */
  def importance(raw: DataFrame, ratios: DataFrame, idCol: String,
      textCol: String, dim: Int): DataFrame =
    features(raw, idCol, textCol, dim)
      .join(broadcast(ratios), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"), sum(col("ratio")).as("__sum"))
      .select(col(idCol), col("n_feats"),
        idivExpr("__sum", "n_feats").as("imp"))

  /** Score + resample in one call: every raw document with its
    * importance, per-row keep threshold
    * `min(Unit, keepPpm·imp / mean_imp)` (mean over the raw corpus —
    * one 1-row aggregate, broadcast back), and the deterministic
    * hash-gate verdict. Expected keep fraction ≈ keepPpm/Unit, skewed
    * toward target-looking documents.
    */
  def resample(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, dim: Int, keepPpm: Long): DataFrame = {
    require(keepPpm > 0 && keepPpm <= Mixture.Unit,
      s"keepPpm in (0, ${Mixture.Unit}]")
    val imp = importance(raw,
      bucketRatios(raw, target, idCol, textCol, dim), idCol, textCol, dim)
    // mean_imp as floor(Σ imp / n): Σ imp ≤ n·2^26 — exact in int64
    // far past 100 TB row counts
    // floor at 1 so a degenerate all-zero-importance corpus divides
    // cleanly instead of NULLing every threshold
    val mean = imp.agg(sum(col("imp")).as("__s"), count(lit(1)).as("__n"))
      .select(greatest(lit(1L), idivExpr("__s", "__n")).as("__mean_imp"))
    gateTail(imp.crossJoin(broadcast(mean)), idCol, keepPpm)
  }

  /** threshold + hash-gate tail shared by [[resample]] (corpus-mean
    * normalizer) and [[applyModel]] (frozen fitted normalizer): the
    * input carries `__mean_imp` however it was derived.
    */
  private def gateTail(scored: DataFrame, idCol: String,
      keepPpm: Long): DataFrame =
    scored
      .withColumn("__thnum", lit(keepPpm) * col("imp"))
      .withColumn("threshold",
        least(lit(Mixture.Unit), idivExpr("__thnum", "__mean_imp")))
      .withColumn("keep",
        PortableHash.hash60Base(
          concat(lit(GateSalt), col(idCol).cast("string")))
          % Mixture.Unit < col("threshold"))
      .drop("__mean_imp", "__thnum")

  /** A FITTED sampler: the dim-row ratio table plus the frozen mean
    * normalizer and keep rate — DSIR's deployment shape, where the
    * importance weights are computed once on a seed sample and then
    * stream over the crawl. `meanImp` is one long (bounded driver
    * state, like the centroid matrices).
    */
  final case class Model(ratios: DataFrame, dim: Int, meanImp: Long,
      keepPpm: Long)

  /** Fit the sampler once: ratio table from (seed raw, target), mean
    * normalizer from the seed's own importance distribution. The
    * ratio relation is localCheckpoint-materialized — a model is
    * state, not a plan.
    */
  def fit(seedRaw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, dim: Int, keepPpm: Long): Model = {
    require(keepPpm > 0 && keepPpm <= Mixture.Unit,
      s"keepPpm in (0, ${Mixture.Unit}]")
    val ratios = bucketRatios(seedRaw, target, idCol, textCol, dim)
      .localCheckpoint()
    val meanImp = importance(seedRaw, ratios, idCol, textCol, dim)
      .agg(sum(col("imp")).as("__s"), count(lit(1)).as("__n"))
      .select(greatest(lit(1L), idivExpr("__s", "__n")))
      .collect()(0).getLong(0)
    Model(ratios, dim, meanImp, keepPpm)
  }

  /** Apply a fitted sampler to a batch or corpus. Scoring is per-doc
    * against the frozen ratios and normalizer, so the union over ANY
    * batching equals the one-shot apply — a streaming door can call
    * this per micro-batch unchanged (the q133 classifier-gate
    * argument).
    */
  def applyModel(model: Model, docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    gateTail(
      importance(docs, model.ratios, idCol, textCol, model.dim)
        .withColumn("__mean_imp", lit(model.meanImp)),
      idCol, model.keepPpm)
}
