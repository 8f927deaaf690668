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

  /** Per-doc token positions with the two lag predecessors. */
  private def positions(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    df.select(col(idCol), posexplode(TextAnalysis.tokens(col(textCol)))
        .as(Seq("pos", "w")))
      .withColumn("p1", lag(col("w"), 1).over(w))
      .withColumn("p2", lag(col("w"), 2).over(w))
  }

  /** The fitted n-gram count store behind [[backoffScore]]: three
    * (gram, count) relations. Counts are per-doc quantities, so the
    * stores of two disjoint corpus batches ADD ([[merge]]) to the
    * one-shot store — the mergeable-partials contract that lets the
    * count fitting run incrementally (q166) or behind a streaming door
    * (q167), and lets a count store persist through the catalog like
    * any index relation.
    */
  final case class LmCounts(c3: DataFrame, c2: DataFrame, c1: DataFrame) {
    def merge(other: LmCounts): LmCounts = {
      def add(a: DataFrame, b: DataFrame, g: String, c: String) =
        a.unionByName(b).groupBy(col(g)).agg(sum(col(c)).as(c))
      LmCounts(add(c3, other.c3, "g3", "c3"),
        add(c2, other.c2, "g2", "c2"), add(c1, other.c1, "g1", "c1"))
    }
    /** Materialize each relation (batch-fold hygiene: fold chains are
      * iterative plans, so incremental/streaming callers checkpoint
      * per fold — the localCheckpoint loop invariant). */
    def checkpointed(): LmCounts =
      LmCounts(c3.localCheckpoint(), c2.localCheckpoint(),
        c1.localCheckpoint())
  }

  /** Fit the trigram/bigram/unigram count store on a reference corpus
    * (one explode + two doc-keyed lag windows + three keyed counts).
    */
  def fitBackoff(train: DataFrame, idCol: String,
      textCol: String): LmCounts = {
    val trPos = positions(train, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    countsOf(trPos)
  }

  /** Fit + eagerly materialize the store — the batch-fold entry point
    * for incremental/streaming callers. Unlike [[fitBackoff]] (whose
    * position cache must stay alive for the lazy [[backoffScore]]
    * result's lifetime), this variant releases the intermediate
    * position cache once the three count relations are checkpointed —
    * a per-micro-batch fit would otherwise pin one dead cache entry
    * per batch in the CacheManager for the stream's lifetime.
    */
  def fitBackoffMaterialized(train: DataFrame, idCol: String,
      textCol: String): LmCounts = {
    val trPos = positions(train, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = countsOf(trPos).checkpointed()
    trPos.unpersist()
    counts
  }

  private def countsOf(trPos: DataFrame): LmCounts =
    LmCounts(
      trPos.filter(col("p2").isNotNull)
        .select(concat_ws(" ", col("p2"), col("p1"), col("w")).as("g3"))
        .groupBy(col("g3")).agg(count(lit(1)).as("c3")),
      trPos.filter(col("p1").isNotNull)
        .select(concat_ws(" ", col("p1"), col("w")).as("g2"))
        .groupBy(col("g2")).agg(count(lit(1)).as("c2")),
      trPos.groupBy(col("w").as("g1")).agg(count(lit(1)).as("c1")))

  /** Trigram STUPID-BACKOFF familiarity (Brants et al. 2007, "Large
    * Language Models in Machine Translation") — the CCNet-style
    * reference-LM quality score, in exact integer arithmetic: n-gram
    * counts FIT on a reference corpus, held-out documents scored per
    * trigram position with the classic backoff chain
    *
    *   S(w | a b) = c3(a b w)/c2(a b)            if the trigram was seen
    *              = 0.4 · c2(b w)/c1(b)          else if the bigram was
    *              = 0.4² · c1(w)/N               else if the word was
    *              = 0                             never seen
    *
    * scaled to parts-per-million with every division SQL `div` (==
    * DuckDB `//` on nonnegative ints — the portable idiom), so unlike a
    * real logprob perplexity (cross-engine `ln`) the score replays
    * bit-identically in the oracle (q160). 0.4 and 0.4² become the
    * integer factors 400 000 and 160 000; numerators stay inside int64
    * for any corpus below ~9·10¹² reference tokens (counts · 10⁶).
    *
    * The fit/apply split is the deployment shape ([[graft.pipeline
    * .Dsir.fit]]'s argument): self-scoring a corpus never exercises
    * backoff (every trigram of the corpus has count ≥ 1 in itself).
    * Scoring is per-doc against the frozen count relations, so any
    * batching equals the one-shot apply.
    *
    * Shape: one explode + two doc-keyed lead windows per side; count
    * relations keyed by gram; scoring is five keyed left joins of the
    * position relation (trigram, context-bigram, backoff-bigram, two
    * unigrams) plus the broadcast 1-row total — never all-pairs.
    *
    * @return per scored document with ≥ 3 tokens: (idCol, n_ctx,
    *   score_sum, score_mean) where score_mean = score_sum/n_ctx in
    *   double. Like [[graft.similarity.Similarity.semanticDedup]], the
    *   reference position relation stays cached for the lazy result's
    *   lifetime (caller-managed eviction; identical re-invocations
    *   reuse the same cache entry).
    */
  def backoffScore(train: DataFrame, docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    backoffScoreWith(fitBackoff(train, idCol, textCol), docs, idCol,
      textCol)

  /** Score `docs` against a fitted (possibly incrementally merged)
    * count store — the apply side of [[backoffScore]].
    */
  def backoffScoreWith(counts: LmCounts, docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val id = col(idCol)
    val (c3, c2, c1) = (counts.c3, counts.c2, counts.c1)
    // N = total reference tokens = the unigram count total
    val n = c1.agg(sum(col("c1")).as("n_total"))
    val pos = positions(docs, idCol, textCol).filter(col("p2").isNotNull)
    val scored = pos
      .join(c3.withColumnRenamed("c3", "ct"),
        concat_ws(" ", col("p2"), col("p1"), col("w")) === col("g3"), "left")
      .join(c2.select(col("g2").as("g2p"), col("c2").as("cbp")),
        concat_ws(" ", col("p2"), col("p1")) === col("g2p"), "left")
      .join(c2.select(col("g2").as("g2b"), col("c2").as("cb")),
        concat_ws(" ", col("p1"), col("w")) === col("g2b"), "left")
      .join(c1.select(col("g1").as("u1p"), col("c1").as("cup")),
        col("p1") === col("u1p"), "left")
      .join(c1.select(col("g1").as("u1w"), col("c1").as("cuw")),
        col("w") === col("u1w"), "left")
      .crossJoin(broadcast(n))
      .withColumn("score",
        when(col("ct").isNotNull, expr("ct * 1000000 div cbp"))
          .when(col("cb").isNotNull, expr("cb * 400000 div cup"))
          .when(col("cuw").isNotNull, expr("cuw * 160000 div n_total"))
          .otherwise(lit(0L)))
    scored.groupBy(id)
      .agg(count(lit(1)).as("n_ctx"), sum(col("score")).as("score_sum"))
      .select(id, col("n_ctx"), col("score_sum"),
        (col("score_sum").cast("double") / col("n_ctx").cast("double"))
          .as("score_mean"))
  }

  /** The FINE-GRAINED Gopher repetition family (Rae et al., Table A1)
    * — the six per-document signals [[signals]]' coarse pair doesn't
    * cover, with their published thresholds:
    *
    *   - `dup_line_frac` (> 0.30): line occurrences beyond the first /
    *     total non-blank lines;
    *   - `dup_line_char_frac` (> 0.20): characters in those repeated
    *     occurrences / total line characters;
    *   - `top{2,3,4}_char_frac` (> 0.20/0.18/0.16): character mass
    *     (count × gram char length) of the heaviest DUPLICATED n-gram
    *     over total token characters — zero when no gram repeats
    *     (Gopher takes the most frequent gram outright; anchoring on
    *     mass keeps the max deterministic under count ties and reads
    *     0 for repetition-free docs, the gate's intent);
    *   - `dup5_char_frac` (> 0.15): characters of token positions
    *     covered by ANY 5-gram occurring twice or more — positions
    *     counted ONCE (coverage, not occurrence-sum, per the paper's
    *     "not double counting overlapping chars");
    *   - `repetitive_fine`: the OR of the six gates.
    *
    * Char masses are token characters (whitespace normalized away) —
    * the token-level adaptation [[signals]] already establishes. All
    * counts are exact BIGINTs; each fraction is ONE final double
    * division, so values replay bit-identically cross-engine.
    *
    * Scale shape: one line explode + (doc, line) / doc aggregates; one
    * token explode + ONE doc-keyed lead window feeding all four gram
    * sizes (2/3/4 stack through an inline 3-struct explode; 5 keeps
    * its positions for coverage); every shuffle keys on the doc id or
    * (doc, gram) — no cross-doc state anywhere.
    */
  def fineSignals(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val id = col(idCol)
    def frac(num: org.apache.spark.sql.Column,
        den: org.apache.spark.sql.Column) =
      when(den > 0, num.cast("double") / den.cast("double"))
        .otherwise(lit(0.0))

    val lineDoc = docs
      .select(id, explode(split(col(textCol), "\n")).as("line"))
      .filter(length(trim(col("line"))) > 0)
      .groupBy(id, col("line")).agg(count(lit(1)).as("c"))
      .select(id, col("c"), length(col("line")).cast("long").as("len"))
      .groupBy(id).agg(
        sum(col("c")).as("n_lines"),
        count(lit(1)).as("n_dl"),
        sum(col("c") * col("len")).as("line_chars"),
        sum((col("c") - 1) * col("len")).as("dup_line_chars"))

    val toks = docs.select(id,
        posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos", "tok")))
      .withColumn("len", length(col("tok")).cast("long"))
    val tokDoc = toks.groupBy(id).agg(
      count(lit(1)).as("n_tok"), sum(col("len")).as("n_chars"))

    val w = Window.partitionBy(id).orderBy(col("pos"))
    val leads = toks
      .withColumn("t1", lead(col("tok"), 1).over(w))
      .withColumn("t2", lead(col("tok"), 2).over(w))
      .withColumn("t3", lead(col("tok"), 3).over(w))
      .withColumn("t4", lead(col("tok"), 4).over(w))

    def gramStruct(n: Int) = {
      val parts = Seq(col("tok")) ++ (1 until n).map(i => col(s"t$i"))
      struct(lit(n).as("n"),
        when(parts.last.isNotNull,
          concat_ws("\u001f", parts: _*)).as("gram"),
        parts.map(length(_).cast("long")).reduce(_ + _).as("glen"))
    }
    val topMass = leads
      .select(id, explode(array(
        gramStruct(2), gramStruct(3), gramStruct(4))).as("g"))
      .select(id, col("g.n").as("n"), col("g.gram").as("gram"),
        col("g.glen").as("glen"))
      .filter(col("gram").isNotNull)
      .groupBy(id, col("n"), col("gram"))
      .agg(count(lit(1)).as("c"), max(col("glen")).as("glen"))
      .filter(col("c") >= 2)
      .groupBy(id).agg(
        max(when(col("n") === 2, col("c") * col("glen"))).as("m2"),
        max(when(col("n") === 3, col("c") * col("glen"))).as("m3"),
        max(when(col("n") === 4, col("c") * col("glen"))).as("m4"))

    val g5 = leads.filter(col("t4").isNotNull)
      .select(id, col("pos"), concat_ws("\u001f", col("tok"), col("t1"),
        col("t2"), col("t3"), col("t4")).as("g5"))
    val dup5 = g5
      .join(g5.groupBy(id, col("g5")).agg(count(lit(1)).as("c"))
        .filter(col("c") >= 2).select(id, col("g5")), Seq(idCol, "g5"))
      .select(id, explode(sequence(col("pos"), col("pos") + 4)).as("cpos"))
      .distinct()
      .join(toks.select(id, col("pos").as("cpos"), col("len")),
        Seq(idCol, "cpos"))
      .groupBy(id).agg(sum(col("len")).as("dup5_chars"))

    val z = lit(0L)
    docs.select(id)
      .join(lineDoc, Seq(idCol), "left")
      .join(tokDoc, Seq(idCol), "left")
      .join(topMass, Seq(idCol), "left")
      .join(dup5, Seq(idCol), "left")
      .select(id,
        coalesce(col("n_lines"), z).as("n_lines"),
        coalesce(col("n_tok"), z).as("n_tok"),
        frac(coalesce(col("n_lines"), z) - coalesce(col("n_dl"), z),
          coalesce(col("n_lines"), z)).as("dup_line_frac"),
        frac(coalesce(col("dup_line_chars"), z),
          coalesce(col("line_chars"), z)).as("dup_line_char_frac"),
        frac(coalesce(col("m2"), z), coalesce(col("n_chars"), z))
          .as("top2_char_frac"),
        frac(coalesce(col("m3"), z), coalesce(col("n_chars"), z))
          .as("top3_char_frac"),
        frac(coalesce(col("m4"), z), coalesce(col("n_chars"), z))
          .as("top4_char_frac"),
        frac(coalesce(col("dup5_chars"), z), coalesce(col("n_chars"), z))
          .as("dup5_char_frac"))
      .select(col(idCol), col("n_lines"), col("n_tok"),
        col("dup_line_frac"), col("dup_line_char_frac"),
        col("top2_char_frac"), col("top3_char_frac"),
        col("top4_char_frac"), col("dup5_char_frac"),
        (col("dup_line_frac") > 0.30 ||
          col("dup_line_char_frac") > 0.20 ||
          col("top2_char_frac") > 0.20 ||
          col("top3_char_frac") > 0.18 ||
          col("top4_char_frac") > 0.16 ||
          col("dup5_char_frac") > 0.15).as("repetitive_fine"))
  }
}
