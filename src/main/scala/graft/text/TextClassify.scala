package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Model-based quality filtering: linear bag-of-words inference with
  * the hashing trick — the shape of the fastText-style classifier
  * gates production pretraining pipelines run after the heuristic
  * gates (quality score, repetition, langId).
  *
  * The model is DATA, not code: a `(bucket, weight)` relation with
  * `dim` rows — however the weights were trained, inference here is
  * one broadcast join against the exploded token stream plus one
  * keyed aggregation. Token → bucket uses the portable 60-bit hash
  * mod dim, weights are INTEGERS (scaled fixed-point, as trained
  * models ship for quantized inference), so the per-doc score is an
  * exact integer sum — commutative, layout-independent, and
  * bit-replayable in the oracle, where cross-engine double dot
  * products would not be. The accept gate is a mean-weight threshold
  * expressed as integer cross-multiplication
  * (`score * den >= num * n_tokens`), no division anywhere.
  *
  * At 100 TB: the corpus side is one tokenize+explode scan feeding a
  * map-side-combinable sum; the model side is dim rows — broadcast;
  * nothing shuffles but doc-keyed partial sums.
  */
object TextClassify {

  /** Hash bucket of a token in a dim-bucket model (seeded so the
    * feature space is independent of the other corpus hashes).
    */
  val BucketSeed = 9

  def bucket(token: Column, dim: Int): Column =
    PortableHash.hash60(token, BucketSeed) % lit(dim.toLong)

  /** DuckDB SQL computing exactly [[bucket]]. */
  def bucketSql(tokenExpr: String, dim: Int): String =
    s"(${PortableHash.hash60Sql(tokenExpr, BucketSeed)} % $dim)"

  /** Score every document with a hashed linear model and gate on mean
    * token weight >= thresholdNum/thresholdDen.
    *
    * @param weights model relation with integer columns
    *                `(bucket: long, weight: long)`, `dim` rows
    * @return (id, n_tokens, score, keep) — exact integers + boolean
    */
  def hashedLinear(docs: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, dim: Int,
      thresholdNum: Long, thresholdDen: Long): DataFrame = {
    require(thresholdDen > 0, "thresholdDen > 0")
    val toks = docs.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("token"))
    // LEFT join + coalesce: a sparse trained model (weights relation not
    // covering every bucket) must still count the unmatched tokens in
    // n_tokens — an inner join would silently skew the mean-weight gate
    toks
      .select(col(idCol), bucket(col("token"), dim).as("bucket"))
      .join(broadcast(weights), Seq("bucket"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("weight"), lit(0L))).as("score"))
      .withColumn("keep",
        col("score") * lit(thresholdDen) >= lit(thresholdNum) * col("n_tokens"))
  }

  /** Batch-perceptron TRAINING of the hashed linear model — the learn
    * side of [[hashedLinear]]: `labeled` docs carry `labelCol` = +1
    * (keep) / -1 (junk); features are the SAME hashed bag-of-words
    * buckets inference uses; each of `rounds` full-batch rounds applies
    * the classic update
    *
    *   w_t(b) = w_{t-1}(b) + Σ_{misclassified i} y_i · x_i(b)
    *
    * with "misclassified" = `y · score <= 0` (all-zero initial weights
    * update on every doc in round 1). Everything is exact INTEGER
    * arithmetic — token counts and weights are longs — and updates are
    * full-batch, so within-round order is irrelevant: training is
    * layout-independent and bit-replayable in the DuckDB oracle, where
    * the rounds unroll as CTEs (q145), the same pattern as BPE merges
    * and the Lloyd steps. Gradient methods would need exp/log — not
    * portable; the perceptron needs nothing past + and ×.
    *
    * Scale shape: the (doc, bucket, cnt) feature matrix is built once
    * (one tokenize+explode scan, map-side-combinable count) and
    * localCheckpoint-materialized; each round is one broadcast join +
    * doc-keyed sum + a ≤dim-row delta aggregate collected to the
    * driver (bounded state, like Selection's 256-row histograms).
    * Returns the `(bucket, weight)` model relation [[hashedLinear]]
    * consumes, with zero-weight buckets included (dense, dim rows).
    */
  def trainPerceptron(labeled: DataFrame, idCol: String, textCol: String,
      labelCol: String, dim: Int, rounds: Int): DataFrame = {
    require(dim > 0 && rounds > 0, "dim and rounds must be positive")
    val spark = labeled.sparkSession
    val x = labeled
      .select(col(idCol), col(labelCol).cast("long").as("__y"),
        explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .select(col(idCol), col("__y"), bucket(col("token"), dim).as("bucket"))
      .groupBy(col(idCol), col("__y"), col("bucket"))
      .agg(count(lit(1)).cast("long").as("cnt"))
      .localCheckpoint()
    val w = Array.fill(dim)(0L)
    def weightsDf = {
      import spark.implicits._
      w.toSeq.zipWithIndex.map { case (wt, b) => (b.toLong, wt) }
        .toDF("bucket", "weight")
    }
    (0 until rounds).foreach { _ =>
      val mis = x.join(broadcast(weightsDf), Seq("bucket"), "left")
        .groupBy(col(idCol), col("__y"))
        .agg(sum(col("cnt") * coalesce(col("weight"), lit(0L)))
          .as("score"))
        .filter(col("__y") * col("score") <= 0)
        .select(col(idCol), col("__y").as("__ym"))
      x.join(mis, Seq(idCol))
        .groupBy(col("bucket"))
        .agg(sum(col("__ym") * col("cnt")).as("d"))
        .collect()
        .foreach(r => w(r.getLong(0).toInt) += r.getLong(1))
    }
    weightsDf
  }

  /** Deterministic pseudo-trained weight table (bucket, weight) with
    * weight uniform-ish in [-1000, 1000] — the portable stand-in for a
    * shipped model in oracle-checked queries; real deployments pass
    * their trained relation instead.
    */
  def syntheticWeights(spark: org.apache.spark.sql.SparkSession,
      dim: Int): DataFrame =
    spark.range(dim).select(col("id").as("bucket"),
      (PortableHash.hash60(col("id").cast("string"), seed = 7)
        % lit(2001L) - lit(1000L)).as("weight"))

  /** DuckDB CTE body generating exactly [[syntheticWeights]]. */
  def syntheticWeightsSql(dim: Int): String =
    s"""SELECT range AS bucket,
       |  (${PortableHash.hash60Sql("CAST(range AS VARCHAR)", 7)} % 2001) - 1000
       |    AS weight
       |FROM range($dim)""".stripMargin
}
