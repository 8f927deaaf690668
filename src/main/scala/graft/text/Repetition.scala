package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Repetition-based quality signals (the Gopher/MassiveText family of
  * rules): documents dominated by a few tokens or by one repeated
  * n-gram are boilerplate/spam-shaped and get filtered before
  * pretraining. All signals are exact integer counts with one final
  * double division each, so they replay bit-identically in the DuckDB
  * oracle (q90).
  *
  * Dataflow: one token explode, then keyed aggregations only —
  * (doc, token) counts for the unique/top-token signals, a doc-keyed
  * `lead` window for bigram occurrences (NOT deduped — the mass of the
  * single most frequent bigram is the signal), (doc, bigram) counts,
  * and a final per-doc join. Every shuffle keys on the doc id (or
  * (doc, gram)), so the pass scales like any other keyed aggregate.
  */
object Repetition {

  /** Per-document repetition signals:
    *
    *   - `n_tok`, `n_unique`: token occurrences / distinct tokens;
    *   - `uniq_frac`  = n_unique / n_tok;
    *   - `top_tok_frac` = occurrences of the most frequent token / n_tok;
    *   - `top_gram_frac` = occurrences of the most frequent bigram /
    *     total bigrams (NULL for docs with < 2 tokens);
    *   - `repetitive`: the Gopher-style gate — most-common-bigram mass
    *     over 8% or unique-token fraction under 40%.
    *
    * Thresholds follow Rae et al. (Gopher), "Scaling Language Models",
    * Table A1 (duplicate n-gram / fraction-unique filters), adapted to
    * bigrams.
    */
  def signals(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(idCol)
    val toks = docs.select(id,
      posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos", "tok")))
    val tokStats = toks
      .groupBy(id, col("tok")).agg(count(lit(1)).as("n"))
      .groupBy(id).agg(
        sum(col("n")).as("n_tok"),
        count(lit(1)).as("n_unique"),
        max(col("n")).as("top_tok_n"))
    val gramStats = toks
      .withColumn("nxt", lead(col("tok"), 1)
        .over(Window.partitionBy(id).orderBy(col("pos"))))
      .filter(col("nxt").isNotNull)
      .select(id, concat_ws(" ", col("tok"), col("nxt")).as("gram"))
      .groupBy(id, col("gram")).agg(count(lit(1)).as("n"))
      .groupBy(id).agg(
        sum(col("n")).as("n_gram"),
        max(col("n")).as("top_gram_n"))
    val d = (c: org.apache.spark.sql.Column) => c.cast("double")
    tokStats.join(gramStats, Seq(idCol), "left")
      .select(id,
        col("n_tok"),
        col("n_unique"),
        (d(col("n_unique")) / d(col("n_tok"))).as("uniq_frac"),
        (d(col("top_tok_n")) / d(col("n_tok"))).as("top_tok_frac"),
        (d(col("top_gram_n")) / d(col("n_gram"))).as("top_gram_frac"),
        (coalesce(d(col("top_gram_n")) / d(col("n_gram")), lit(0.0)) > 0.08 ||
          d(col("n_unique")) / d(col("n_tok")) < 0.4).as("repetitive"))
  }
}
