package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 relevance ranking: query terms → top-k documents. The
  * retrieval scorer over the inverted index (tf-idf is per-doc
  * salience; this is query relevance): tf saturation (`k1`) + length
  * normalization (`b`) per BM25, with a RATIONAL idf
  * `(N - df + 0.5) / (df + 0.5)` instead of its `ln`, because
  * cross-engine ln is not bit-stable while one double division is.
  * This is an INTENTIONAL approximation of BM25: ln is monotone, so
  * for SINGLE-term queries the ranking is exactly BM25's, but a
  * per-doc score is a SUM over terms and a monotone transform of each
  * addend does not preserve the ordering of sums — multi-term
  * rankings can diverge from standard BM25 (the rational idf weights
  * rare terms far more heavily than ln does).
  *
  * Terms are a RELATION (one `term` column), broadcast into the token
  * join — any query, not a fixed list. Per-doc totals fold the term
  * scores in term-sorted order with a strict left fold from 0.0 (a
  * higher-order `aggregate` — CodegenFallback, but per-document over at
  * most |terms| elements, far off any quadratic path), so the double
  * sum is order-deterministic and replays bit-identically in DuckDB
  * (`[0.0] || list(score ORDER BY token)` + `list_reduce`). Top-k is
  * TakeOrdered (O(k) per partition), ranks assigned on the survivors.
  *
  * At scale: the corpus-side work is one tokenize pass + keyed
  * aggregations; the terms side is broadcast; nothing shuffles the
  * corpus beyond the per-doc groupBys.
  */
object Bm25 {

  def rank(docs: DataFrame, idCol: String, textCol: String,
      terms: DataFrame, k: Int = 20,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val id = col(idCol)
    val toks = docs.select(id,
      explode(TextAnalysis.tokens(col(textCol))).as("token"))
    val dl = toks.groupBy(id).agg(count(lit(1)).as("dl"))
    val stats = dl
      .agg(sum(col("dl")).as("tot"), count(lit(1)).as("nd"))
      .select(col("nd"),
        (col("tot").cast("double") / col("nd").cast("double")).as("avgdl"))
    val tf = toks
      .join(broadcast(terms.select(col("term").as("token"))), Seq("token"))
      .groupBy(id, col("token")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(dfreq), "token")
      .join(dl, idCol)
      .crossJoin(broadcast(stats))
      .withColumn("score",
        ((col("nd").cast("double") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))) *
          (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * (col("dl") / col("avgdl")))))
    val perDoc = scored.groupBy(id)
      .agg(array_sort(collect_list(struct(col("token"), col("score"))))
        .as("ts"))
      .withColumn("bm25",
        aggregate(col("ts"), lit(0.0), (acc, x) => acc + x.getField("score")))
      .filter(col("bm25") > 0)
    val top = perDoc.orderBy(col("bm25").desc, id).limit(k)
    top
      // partitionBy(lit(0)): at most k rows reach this exchange (the
      // limit above), so the single partition is by construction — the
      // constant partition key documents that and silences WindowExec's
      // all-data-to-one-partition warning for the genuinely-global case
      .withColumn("rank",
        row_number().over(Window.partitionBy(lit(0)).orderBy(col("bm25").desc, id)))
      .select(id, col("bm25"), col("rank"))
  }
}
