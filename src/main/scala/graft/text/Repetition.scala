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

  /** Corpus-relative bigram familiarity — the LM-lite fluency signal:
    * the fraction of a document's bigram OCCURRENCES whose bigram
    * appears at least `minDf` times across the corpus. Fluent text is
    * built from common word transitions; gibberish and mangled
    * extractions are not. Logprob-free on purpose: exact integer
    * counts + one double division per doc, so the signal replays
    * bit-identically in DuckDB (q108) — where a real LM perplexity
    * (cross-engine `ln`) never could.
    *
    * Shape: one token explode + doc-keyed lead window (the
    * [[signals]] dataflow), a corpus-wide (bigram -> count) aggregate
    * joined back per distinct (doc, bigram) — every shuffle keyed on
    * the doc id or the bigram.
    *
    * @return per document with >= 2 tokens: (idCol, n_bigrams,
    *   n_familiar, familiarity)
    */
  def bigramFamiliarity(docs: DataFrame, idCol: String, textCol: String,
      minDf: Long = 3L): DataFrame = {
    val id = col(idCol)
    val grams = docs
      .select(id, posexplode(TextAnalysis.tokens(col(textCol)))
        .as(Seq("pos", "tok")))
      .withColumn("nxt", lead(col("tok"), 1)
        .over(Window.partitionBy(id).orderBy(col("pos"))))
      .filter(col("nxt").isNotNull)
      .select(id, concat_ws(" ", col("tok"), col("nxt")).as("gram"))
    val perDocGram = grams.groupBy(id, col("gram"))
      .agg(count(lit(1)).as("n"))
    val corpusDf = perDocGram.groupBy(col("gram"))
      .agg(sum(col("n")).as("df"))
    perDocGram.join(corpusDf, "gram")
      .groupBy(id)
      .agg(sum(col("n")).as("n_bigrams"),
        sum(when(col("df") >= minDf, col("n")).otherwise(lit(0L)))
          .as("n_familiar"))
      .select(id, col("n_bigrams"), col("n_familiar"),
        (col("n_familiar").cast("double") /
          col("n_bigrams").cast("double")).as("familiarity"))
  }
}
