package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** HYBRID retrieval fusion — Reciprocal Rank Fusion (Cormack, Clarke
  * & Büttcher, SIGIR 2009): combine a lexical ranking (BM25, q99) and
  * a vector ranking (exact or ANN cosine top-k) without score
  * calibration, `rrf(d) = Σ_lists 1/(K + rank_list(d))` — the standard
  * first-stage retriever of a RAG / retrieval-training pipeline, and
  * deliberately rank-based: BM25 scores and cosines live on
  * incomparable scales, ranks always compose.
  *
  * Portability: each term is `1.0 / (K + rank)` in double with K an
  * integer constant, summed in FIXED list order (a two-term
  * `coalesce(x,0)+coalesce(y,0)` — absent-from-list contributes 0), so
  * the fused score replays bit-identically in DuckDB (q177).
  *
  * Scale shape: inputs are top-k RANKINGS (k rows each, k ≪ corpus) —
  * the fusion join is k-row × k-row, negligible next to the rankers
  * themselves; the final global order is a `limit(topK)` TakeOrdered,
  * never a full sort.
  */
object Hybrid {

  /** Fuse two rankings `(idCol, rankCol)` → `(idCol, rank_a, rank_b,
    * rrf, rank)`: `rank_a`/`rank_b` the document's rank in each input
    * (NULL if absent), `rrf` the fused score, `rank` dense from 1 over
    * the `topK` survivors (ties → lower id first).
    */
  def rrf(a: DataFrame, b: DataFrame, idCol: String,
      rankCol: String = "rank", kConst: Int = 60,
      topK: Int = 20): DataFrame = {
    require(kConst > 0 && topK > 0, "kConst and topK must be positive")
    val ra = a.select(col(idCol).as("__ia"), col(rankCol).as("rank_a"))
    val rb = b.select(col(idCol).as("__ib"), col(rankCol).as("rank_b"))
    def term(r: String) =
      coalesce(lit(1.0) / (lit(kConst.toDouble) + col(r).cast("double")),
        lit(0.0))
    val fused = ra.join(rb, col("__ia") === col("__ib"), "full_outer")
      .select(coalesce(col("__ia"), col("__ib")).as(idCol),
        col("rank_a"), col("rank_b"),
        (term("rank_a") + term("rank_b")).as("rrf"))
    fused.orderBy(col("rrf").desc, col(idCol)).limit(topK)
      // at most topK rows reach this exchange (the limit above) — the
      // constant partition key documents the genuinely-global case
      .withColumn("rank", row_number().over(
        Window.partitionBy(lit(0)).orderBy(col("rrf").desc, col(idCol))))
  }
}
