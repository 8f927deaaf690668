package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Order-0 character-entropy quality gate — the Gopher/RefinedWeb
  * "gibberish and spam" signal (high-entropy random spew on one side,
  * low-entropy repeated boilerplate on the other), in EXACT integer
  * arithmetic.
  *
  * Shannon entropy needs `log`, and cross-engine libm low bits are not
  * bit-stable; zlib compression ratio is not oracle-replayable at all.
  * The collision index `sum(c_i^2) / n^2` (the empirical collision
  * probability of two random character draws) is the same signal as
  * Renyi-2 entropy `H2 = -log2(coll)` under a monotone transform — so
  * thresholding `coll` IS thresholding H2, and `coll` is a ratio of
  * exact int64 sums: both gate comparisons are integer
  * cross-multiplications, and the one reported double is a single IEEE
  * division of exact integers (deterministic on both engines).
  *
  * Calibration on the synthetic corpus (measured, sf0.01): real docs
  * span coll in [0.068, 0.100]; uniform 22-symbol hex spew sits in
  * [0.050, 0.056]; 5-symbol repeated spam is 0.200 exactly. Defaults
  * `spew <= 3/50 = 0.06` and `spam >= 1/8 = 0.125` leave a clean
  * margin on both sides. (Very short docs inflate coll by ~1/n — the
  * finite-sample bias is part of the classic signal, flagging
  * tiny fragments as spam-like.)
  *
  * At 100 TB: one scan -> per-character explode -> two map-side-
  * combinable hash aggregations keyed by (doc, char) then doc; nothing
  * else shuffles. No UDF, no HOF — the explode is `sequence` +
  * `substr`, all codegen.
  */
object Entropy {

  /** Default class thresholds as exact rationals. */
  val SpewNum = 3L;  val SpewDen = 50L  // coll <= 3/50  -> "spew"
  val SpamNum = 1L;  val SpamDen = 8L   // coll >= 1/8   -> "spam"

  /** Per-document character-histogram signals:
    * `(id, n_chars, distinct_chars, coll_num)` where
    * `coll_num = sum over characters of count^2` (so the collision
    * index is `coll_num / n_chars^2`). Empty-text documents produce no
    * row (no characters, no histogram) — mirroring the oracle's
    * `generate_series(1, 0)` which unnests to nothing.
    */
  def charSignals(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .filter(length(col(textCol)) > 0)
      .select(col(idCol), col(textCol),
        explode(sequence(lit(1), length(col(textCol)))).as("i"))
      .select(col(idCol), col(textCol).substr(col("i"), lit(1)).as("c"))
      .groupBy(col(idCol), col("c")).agg(count(lit(1)).as("cnt"))
      .groupBy(col(idCol))
      .agg(sum(col("cnt")).as("n_chars"),
        count(lit(1)).as("distinct_chars"),
        sum(col("cnt") * col("cnt")).as("coll_num"))

  /** Classify each document: `spew` (collision index at or below
    * spewNum/spewDen — random high-entropy noise), `spam` (at or above
    * spamNum/spamDen — repetitive low-entropy boilerplate), else `ok`.
    * Returns `(id, n_chars, distinct_chars, coll, cls, keep)`.
    */
  def gate(docs: DataFrame, idCol: String, textCol: String,
      spewNum: Long = SpewNum, spewDen: Long = SpewDen,
      spamNum: Long = SpamNum, spamDen: Long = SpamDen): DataFrame = {
    val n2 = col("n_chars") * col("n_chars")
    charSignals(docs, idCol, textCol)
      .withColumn("coll",
        col("coll_num").cast("double") / n2.cast("double"))
      .withColumn("cls",
        when(col("coll_num") * lit(spamDen) >= lit(spamNum) * n2, "spam")
          .when(col("coll_num") * lit(spewDen) <= lit(spewNum) * n2, "spew")
          .otherwise("ok"))
      .withColumn("keep", col("cls") === "ok")
      .select(col(idCol), col("n_chars"), col("distinct_chars"),
        col("coll"), col("cls"), col("keep"))
  }

  /** DuckDB CTE chain computing exactly [[charSignals]] over relation
    * `src(doc_id-ish idCol, textCol)`, ending in
    * `entsig(idCol, n_chars, distinct_chars, coll_num)`.
    */
  def signalsSql(src: String, idCol: String, textCol: String): String =
    s"""entch AS (
       |  SELECT $idCol, substring($textCol, i, 1) AS c
       |  FROM $src, LATERAL unnest(generate_series(1, length($textCol))) AS _t(i)),
       |enth AS (SELECT $idCol, c, count(*) AS cnt FROM entch GROUP BY 1, 2),
       |entsig AS (SELECT $idCol,
       |    CAST(sum(cnt) AS BIGINT) AS n_chars,
       |    CAST(count(*) AS BIGINT) AS distinct_chars,
       |    CAST(sum(cnt*cnt) AS BIGINT) AS coll_num
       |  FROM enth GROUP BY 1)""".stripMargin
}
