package graft.similarity

import graft.functions.{PortableHash, VectorFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`ArrayType(FloatType)`).
  *
  * The oracle-checked baseline is brute-force cosine top-k: embeddings are
  * cast to double and the dot product is a strict left fold
  * (`aggregate(zip_with(...))`) so the result is bit-identical to the
  * DuckDB `list_reduce` replay — no UDF, stays inside codegen.
  *
  * The scale path is [[signLshBuckets]]: random-hyperplane sign LSH where
  * the "random" projection components are xxhash64(dim, bit) — fully
  * deterministic, no stored model, computable per-row with zero shuffle.
  * Candidates come from same-bucket joins instead of the O(Q·N) cross
  * join; recall is asserted against brute force in the test suite (this
  * path is deliberately not oracle-SQL-portable: it uses the codegen'd
  * xxhash, the right choice at 100 TB).
  */
object Similarity {

  /** Cast float embedding to double for deterministic arithmetic. */
  def asDouble(c: Column): Column = c.cast("array<double>")

  /** Strict left-fold dot product — order-deterministic. Codegen'd
    * native expression (higher-order `aggregate`/`zip_with` would fall
    * back to interpreted eval — ~50x slower on pair joins).
    */
  def dot(a: Column, b: Column): Column = VectorFunctions.dot(a, b)

  def norm2(a: Column): Column = dot(a, a)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(norm2(a) * norm2(b))

  /** Brute-force cosine top-k: for every query vector, the k nearest
    * corpus vectors. One broadcast of the (small) query side, no shuffle
    * of the corpus until the final per-query ranking.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    // norms are computed once per input row, BEFORE the pair join —
    // the join then does one fold per pair instead of three
    val q = queries.select(col(idCol).as("q_id"),
      asDouble(col(vecCol)).as("qe"))
      .withColumn("nq", norm2(col("qe")))
    val c = corpus.select(col(idCol).as("n_id"),
      asDouble(col(vecCol)).as("ce"))
      .withColumn("nc", norm2(col("ce")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("n_id").asc)
    c.crossJoin(broadcast(q))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("cosine",
        dot(col("qe"), col("ce")) / sqrt(col("nq") * col("nc")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("cosine"), col("rank"))
  }

  /** All pairs (a < b) with cosine >= threshold — embedding near-dup
    * detection, exact baseline.
    */
  def cosinePairs(corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val x = corpus.select(col(idCol).as("a"), asDouble(col(vecCol)).as("xe"))
      .withColumn("nx", norm2(col("xe")))
    val y = corpus.select(col(idCol).as("b"), asDouble(col(vecCol)).as("ye"))
      .withColumn("ny", norm2(col("ye")))
    x.join(y, col("a") < col("b"))
      .withColumn("cosine",
        dot(col("xe"), col("ye")) / sqrt(col("nx") * col("ny")))
      .filter(col("cosine") >= threshold)
      .select(col("a"), col("b"), col("cosine"))
  }

  /** Sign-LSH bucket id per vector: `bits` pseudo-random hyperplanes whose
    * components are derived from xxhash64(planeIdx, dimIdx) mapped to
    * [-0.5, 0.5). Vectors in the same bucket are ANN candidates.
    *
    * Cost note: the `bits` projections run as interpreted higher-order
    * folds — linear in corpus (once per vector, not per pair) so it is
    * not the pair-join trap, but a native multi-plane projection
    * expression would cut constant factors ~10x; worth doing before truly
    * large corpora.
    */
  def signLshBuckets(df: DataFrame, idCol: String, vecCol: String,
      bits: Int = 12): DataFrame = {
    val e = asDouble(col(vecCol))
    val bucket = (0 until bits).map { p =>
      // projection = sum_i h(p,i) * e[i], h in [-0.5, 0.5)
      val proj = aggregate(
        zip_with(e, sequence(lit(0), size(e) - 1), (x, i) =>
          x * ((PortableHash.fast(lit(p), i) % 1000000L).cast("double") / 2000000.0)),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
    df.select(col(idCol), col(vecCol), bucket.as("bucket"))
  }

  /** LSH-accelerated near-dup pairs: exact cosine evaluated ONLY on
    * same-bucket (a < b) candidates — the scale path for embedding
    * dedup, linear in corpus + candidates instead of O(n^2). At the
    * 0.99-near-identical threshold, sign-LSH recall is effectively 1:
    * near-identical vectors agree on every hyperplane sign.
    */
  def lshCosinePairs(corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bits: Int = 12): DataFrame = {
    val b = signLshBuckets(corpus, idCol, vecCol, bits)
    val x = b.select(col(idCol).as("a"), asDouble(col(vecCol)).as("xe"),
      col("bucket"))
      .withColumn("nx", norm2(col("xe")))
    val y = b.select(col(idCol).as("b"), asDouble(col(vecCol)).as("ye"),
      col("bucket"))
      .withColumn("ny", norm2(col("ye")))
    x.join(y, Seq("bucket")).filter(col("a") < col("b"))
      .withColumn("cosine",
        dot(col("xe"), col("ye")) / sqrt(col("nx") * col("ny")))
      .filter(col("cosine") >= threshold)
      .select(col("a"), col("b"), col("cosine")).distinct()
  }

  /** LSH-accelerated top-k: rank only same-bucket candidates. Trades
    * recall for a candidate set ~N/2^bits per query; multi-probe = union
    * several bit-flipped buckets (left at 1 probe here; the recall/cost
    * point is asserted in tests).
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, bits: Int = 8): DataFrame = {
    val qb = signLshBuckets(queries, idCol, vecCol, bits)
      .select(col(idCol).as("q_id"), asDouble(col(vecCol)).as("qe"),
        col("bucket"))
      .withColumn("nq", norm2(col("qe")))
    val cb = signLshBuckets(corpus, idCol, vecCol, bits)
      .select(col(idCol).as("n_id"), asDouble(col(vecCol)).as("ce"),
        col("bucket"))
      .withColumn("nc", norm2(col("ce")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("n_id").asc)
    qb.join(cb, Seq("bucket"))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("cosine",
        dot(col("qe"), col("ce")) / sqrt(col("nq") * col("nc")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("cosine"), col("rank"))
  }
}
