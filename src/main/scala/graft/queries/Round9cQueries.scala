package graft.queries

import graft.functions.PortableHash
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 queries, third batch: the SEMANTIC member of the
  * train-vs-eval contamination family (q158) — embedding-space
  * paraphrase leaks the lexical matchers (q120/q121) and the perceptual
  * matchers (q137/q138) cannot see. Every query replays bit-identically
  * in the DuckDB oracle.
  */
object Round9cQueries {

  private val toksExpr =
    """list_filter(string_split_regex(text, '\s+'), x -> x <> '')"""

  private val dotSql = (a: String, b: String) =>
    s"list_reduce(list_transform(generate_series(1, len($a)), i -> $a[i] * $b[i]), (x,y) -> x+y)"

  /** L2 rank key (|v|² row-constant term dropped) — q42's formulation. */
  private def distSql(v: String, cent: String): String =
    s"-2.0 * ${dotSql(v, cent)} + ${dotSql(cent, cent)}"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Cross-corpus SEMANTIC contamination: train = the corpus minus a
    // held-out slice (%5==1); eval = 2x-scaled copies of train's %13
    // slice (cosine-identical paraphrase stand-ins, byte-different,
    // fresh ids) + the held-out slice itself (genuinely new vectors —
    // base embeddings never exceed cosine ~0.6 pairwise, so they must
    // NOT match). Centroids train on the train side only; eval probes
    // its nProbe=2 nearest buckets; candidates join cross-only; exact
    // double cosine >= 0.99 verifies.
    "q158_semantic_cross" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val train = emb.filter(col("vec_id") % 5 =!= 1)
      val evalDf = train.filter(col("vec_id") % 13 === 0)
        .select((col("vec_id") + 3000000L).as("vec_id"),
          // x2 is exponent-only in IEEE: exact in float, and exact
          // again after the oracle's float->double cast
          transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
        .unionByName(emb.filter(col("vec_id") % 5 === 1)
          .select((col("vec_id") + 4000000L).as("vec_id"),
            col("embedding")))
      graft.similarity.Similarity.crossCorpusSemanticMatches(
        train, "vec_id", evalDf, "vec_id", "embedding",
        threshold = 0.99, c = ExtendedQueries.IvfC,
        iters = ExtendedQueries.IvfIters, nProbe = 2)
        .orderBy(col("train_id"), col("eval_id"))
    }),

    // Trigram stupid-backoff familiarity: n-gram counts FIT on the
    // even-numbered sources, the odd-numbered sources SCORED per
    // trigram position through the Brants backoff chain in exact
    // ppm-scaled integer arithmetic (0.4 -> x400000, 0.4^2 -> x160000,
    // every division `div` == `//`). The held-out split makes every
    // backoff branch live: unseen trigrams fall to bigrams, unseen
    // bigrams to unigrams, unseen words to 0.
    "q160_backoff_familiarity" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("source"))
      val srcnum = substring(col("source"), 4, 10).cast("int")
      graft.text.Repetition.backoffScore(
          docs.filter(srcnum % 2 === 0).select(col("doc_id"), col("text")),
          docs.filter(srcnum % 2 === 1).select(col("doc_id"), col("text")),
          "doc_id", "text")
        .orderBy(col("doc_id"))
    })
  )

  val oracleSql: Map[String, String] = Map(

    // The full replay: quantize both corpora, train q42's Lloyd CTEs on
    // the TRAIN side (`qz` is the training relation ivfStepSql reads),
    // assign train rn=1 / eval rn<=2, join cross-only on bucket, exact
    // cosine verify.
    "q158_semantic_cross" ->
      s"""WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         |tr AS (SELECT vec_id, e FROM base WHERE vec_id % 5 <> 1),
         |ev AS (
         |  SELECT vec_id + 3000000 AS vec_id,
         |    list_transform(e, x -> x * 2.0) AS e
         |  FROM tr WHERE vec_id % 13 = 0
         |  UNION ALL
         |  SELECT vec_id + 4000000, e FROM base WHERE vec_id % 5 = 1),
         |qz AS (SELECT vec_id, e,
         |    list_transform(e, x -> round(x * 127.0 / mab)) AS qd
         |  FROM (SELECT vec_id, e,
         |          list_max(list_transform(e, x -> abs(x))) AS mab FROM tr)
         |  WHERE mab > 0),
         |qze AS (SELECT vec_id, e,
         |    list_transform(e, x -> round(x * 127.0 / mab)) AS qd
         |  FROM (SELECT vec_id, e,
         |          list_max(list_transform(e, x -> abs(x))) AS mab FROM ev)
         |  WHERE mab > 0),
         |c0 AS (SELECT cluster, cent FROM (
         |  SELECT qd AS cent,
         |    ROW_NUMBER() OVER (ORDER BY h, vec_id) - 1 AS cluster
         |  FROM (SELECT vec_id, qd,
         |          ${PortableHash.hash60BaseSql("vec_id::VARCHAR")} AS h
         |        FROM qz))
         |  WHERE cluster < ${ExtendedQueries.IvfC}),
         |${(1 to ExtendedQueries.IvfIters)
             .map(ExtendedQueries.ivfStepSql).mkString(",\n")},
         |tb AS (SELECT vec_id, e, cluster AS bucket,
         |    ${dotSql("e", "e")} AS nrm FROM (
         |  SELECT z.vec_id, z.e, c.cluster,
         |    ROW_NUMBER() OVER (PARTITION BY z.vec_id
         |      ORDER BY ${distSql("z.qd", "c.cent")} ASC, c.cluster ASC) AS rn
         |  FROM qz z CROSS JOIN c${ExtendedQueries.IvfIters} c) WHERE rn = 1),
         |eb AS (SELECT vec_id, e, cluster AS bucket,
         |    ${dotSql("e", "e")} AS nrm FROM (
         |  SELECT z.vec_id, z.e, c.cluster,
         |    ROW_NUMBER() OVER (PARTITION BY z.vec_id
         |      ORDER BY ${distSql("z.qd", "c.cent")} ASC, c.cluster ASC) AS rn
         |  FROM qze z CROSS JOIN c${ExtendedQueries.IvfIters} c) WHERE rn <= 2)
         |SELECT train_id, eval_id, cosine FROM (
         |  SELECT t.vec_id AS train_id, v.vec_id AS eval_id,
         |    ${dotSql("t.e", "v.e")} / sqrt(t.nrm * v.nrm) AS cosine
         |  FROM tb t JOIN eb v ON t.bucket = v.bucket)
         |WHERE cosine >= 0.99::DOUBLE
         |ORDER BY train_id, eval_id""".stripMargin,

    // The same joins, counts, and backoff CASE as the engine; integer
    // sums BIGINT-cast (DuckDB SUM(int) -> HUGEINT), final mean = one
    // double division.
    "q160_backoff_familiarity" ->
      s"""WITH d AS (SELECT doc_id,
         |    CAST(substr(source, 4) AS INT) AS srcnum,
         |    $toksExpr AS t
         |  FROM documents),
         |trp AS (SELECT doc_id, t FROM d WHERE srcnum % 2 = 0),
         |scp AS (SELECT doc_id, t FROM d WHERE srcnum % 2 = 1),
         |c3 AS (SELECT t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g3,
         |    CAST(COUNT(*) AS BIGINT) AS ct
         |  FROM trp, UNNEST(generate_series(1, len(t) - 2)) AS u(i)
         |  GROUP BY g3),
         |c2 AS (SELECT t[i] || ' ' || t[i+1] AS g2,
         |    CAST(COUNT(*) AS BIGINT) AS c2
         |  FROM trp, UNNEST(generate_series(1, len(t) - 1)) AS u(i)
         |  GROUP BY g2),
         |c1 AS (SELECT t[i] AS g1, CAST(COUNT(*) AS BIGINT) AS c1
         |  FROM trp, UNNEST(generate_series(1, len(t))) AS u(i)
         |  GROUP BY g1),
         |n AS (SELECT CAST(SUM(len(t)) AS BIGINT) AS n_total FROM trp),
         |pos AS (SELECT doc_id, t[i] AS p2, t[i+1] AS p1, t[i+2] AS w
         |  FROM scp, UNNEST(generate_series(1, len(t) - 2)) AS u(i)),
         |sc AS (SELECT p.doc_id,
         |    CASE WHEN t3.ct IS NOT NULL THEN t3.ct * 1000000 // cbp.c2
         |      WHEN bb.c2 IS NOT NULL THEN bb.c2 * 400000 // up.c1
         |      WHEN uw.c1 IS NOT NULL THEN uw.c1 * 160000 // n.n_total
         |      ELSE CAST(0 AS BIGINT) END AS score
         |  FROM pos p
         |  LEFT JOIN c3 t3 ON t3.g3 = p.p2 || ' ' || p.p1 || ' ' || p.w
         |  LEFT JOIN c2 cbp ON cbp.g2 = p.p2 || ' ' || p.p1
         |  LEFT JOIN c2 bb ON bb.g2 = p.p1 || ' ' || p.w
         |  LEFT JOIN c1 up ON up.g1 = p.p1
         |  LEFT JOIN c1 uw ON uw.g1 = p.w
         |  CROSS JOIN n)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_ctx,
         |  CAST(SUM(score) AS BIGINT) AS score_sum,
         |  CAST(CAST(SUM(score) AS BIGINT) AS DOUBLE)
         |    / CAST(CAST(COUNT(*) AS BIGINT) AS DOUBLE) AS score_mean
         |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )
}
