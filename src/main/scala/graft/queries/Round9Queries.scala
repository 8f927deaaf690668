package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 queries. Every query replays bit-identically in the DuckDB
  * oracle.
  */
object Round9Queries {

  /** ADC-candidate count for q136's exact re-rank tail. */
  private val PqR = 100

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // IVF-PQ with an exact re-rank tail: the compressed index (q92's
    // exact configuration) picks the 100 strongest ADC candidates per
    // query, then ONLY those rows fetch their original embeddings and
    // are re-scored with the exact double cosine — recall@10 doubles
    // (0.32 -> 0.62 at nProbe=4, saturating the routing ceiling;
    // BASELINE.md round-9 curve) while the float corpus stays cold for
    // all but Q x 100 rows. Exact arithmetic end-to-end, ranks
    // hash-checked.
    "q136_ann_ivfpq_refined" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      graft.similarity.Similarity.ivfPqTopKRefined(
        emb.filter(col("vec_id") < 50), emb, "vec_id", "embedding",
        k = 10, c = Round5Queries.PqC, m = Round5Queries.PqM,
        nProbe = Round5Queries.PqProbe, kCodes = Round5Queries.PqK,
        refineR = PqR)
        .orderBy(col("q_id"), col("rank"))
    })
  )

  // ---- oracle SQL ----------------------------------------------------

  private val dotSql = Round5Queries.dotSql

  val oracleSql: Map[String, String] = Map(

    // q92's CTE chain verbatim (training + ADC scoring), then: ADC
    // top-R per query, exact double-cosine re-score of those pairs
    // from the original embeddings, final rank over the exact score.
    "q136_ann_ivfpq_refined" ->
      s"""WITH ${Round5Queries.pqAdcCtesSql},
         |cand_r AS (SELECT q_id, n_id FROM (
         |  SELECT q_id, n_id,
         |    ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY s / sqrt(nq * nc) DESC, n_id ASC) AS rr
         |  FROM adc) t WHERE rr <= $PqR),
         |rs AS (SELECT c.q_id, c.n_id,
         |    ${dotSql("qe.e", "ne.e")}
         |      / sqrt(${dotSql("qe.e", "qe.e")} * ${dotSql("ne.e", "ne.e")})
         |      AS cosine
         |  FROM cand_r c
         |  JOIN emb qe ON qe.vec_id = c.q_id
         |  JOIN emb ne ON ne.vec_id = c.n_id)
         |SELECT q_id, n_id, cosine, rank FROM (
         |  SELECT q_id, n_id, cosine,
         |    ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY cosine DESC, n_id ASC) AS rank
         |  FROM rs) t
         |WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin
  )
}
