package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING at corpus scale — the learn
  * side of the pipeline whose apply side q38's regex tokenizer only
  * approximates. Reference scope: tokenization/token-budget machinery
  * (`/root/reference/README.md` has no tokenizer; this extends the
  * north-star LLM-pipeline surface like q91/q96/q103).
  *
  * Spark-first shape: the CORPUS is touched exactly once (tokenize +
  * `groupBy(word).count()` — the classic BPE reduction onto the unique-
  * word frequency dictionary). Every merge round after that is
  * dict-sized, fully distributed (pair-count `groupBy` + 1-row argmax),
  * and the only driver traffic is ONE (pair, count) row per round —
  * the same bounded-collect contract as the centroid matrices
  * (`Similarity.scala`). The dict is `localCheckpoint`ed per round
  * (iterative-loop lineage invariant).
  *
  * Determinism contract (what makes the DuckDB replay bit-exact):
  *   - pair counts are exact integer sums of word frequencies;
  *   - the winning pair each round is max by (count DESC, lhs ASC,
  *     rhs ASC) — both engines compare strings as UTF-8 bytes;
  *   - re-segmentation is a LITERAL left-to-right non-overlapping
  *     string replace, which IS greedy BPE when each symbol is wrapped
  *     in U+001F separators: the segmentation state is
  *     `(s1)(s2)...` with `(x) = SEP x SEP`, the pair (a,b)
  *     occurs only as the 2-symbol substring `(a)(b)` (symbols never
  *     contain the separator, so no cross-boundary false match), and
  *     adjacent matches share no characters, so "aaaa" under merge
  *     (a,a) becomes [aa][aa] and "aaa" becomes [aa][a] — exactly the
  *     greedy scan. `replace` has these semantics in both Spark
  *     (UTF8String.replace) and DuckDB.
  */
object Bpe {

  /** Symbol separator. Control char U+001F never appears in tokenized
    * text ([[TextAnalysis.tokens]] splits on `\s+`; corpus words are
    * printable). */
  val Sep = "\u001f"

  private def wrap(s: String): String = Sep + s + Sep

  /** Initial segmentation: every character wrapped. */
  def wrapChars(word: Column): Column =
    regexp_replace(word, "(.)", Sep + "$1" + Sep)

  /** Wrapped segmentation string -> array of symbols. `array_remove`
    * (codegen), not a `filter` lambda (CodegenFallback): this runs
    * per word OCCURRENCE on the corpus-scale apply path. */
  def symbols(seg: Column): Column =
    array_remove(split(seg, Sep), "")

  final case class Merge(rank: Int, lhs: String, rhs: String, count: Long)

  /** The unique-word frequency dictionary with initial per-char
    * segmentation — the single corpus-scale pass. */
  def wordDict(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .withColumn("seg", wrapChars(col("word")))

  /** Learn `numMerges` BPE merges from the corpus. Each round:
    * dict-sized pair-count groupBy, one collected argmax row, one
    * literal replace over the dict. Stops early if no pair remains.
    */
  def trainMerges(docs: DataFrame, textCol: String,
      numMerges: Int): Seq[Merge] = {
    var dict = wordDict(docs, textCol).localCheckpoint()
    val out = Seq.newBuilder[Merge]
    var i = 1
    var done = false
    while (i <= numMerges && !done) {
      val syms = symbols(col("seg"))
      val best = dict
        .select(col("freq"), syms.as("syms"))
        .withColumn("n", size(col("syms")))
        .filter(col("n") >= 2)
        .select(col("freq"), col("syms"),
          explode(sequence(lit(1), col("n") - 1)).as("j"))
        .select(col("freq"),
          element_at(col("syms"), col("j")).as("lhs"),
          element_at(col("syms"), col("j") + 1).as("rhs"))
        .groupBy(col("lhs"), col("rhs"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("lhs").asc, col("rhs").asc)
        .limit(1)
        .collect()
      if (best.isEmpty) done = true
      else {
        val (l, r, c) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        out += Merge(i, l, r, c)
        val prev = dict
        dict = dict
          .withColumn("seg",
            org.apache.spark.sql.functions.replace(col("seg"),
              lit(wrap(l) + wrap(r)), lit(wrap(l + r))))
          .localCheckpoint()
        prev.unpersist()
        i += 1
      }
    }
    out.result()
  }

  /** Merges as a DataFrame: (rank, lhs, rhs, merged, pair_count). */
  def train(docs: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    trainMerges(docs, textCol, numMerges)
      .map(m => (m.rank, m.lhs, m.rhs, m.lhs + m.rhs, m.count))
      .toDF("rank", "lhs", "rhs", "merged", "pair_count")
  }

  /** Apply trained merges to one word: the rank-ordered replace chain
    * over the wrapped-char form — pure codegen string ops, no state,
    * safe on any corpus column (the apply side for data that arrives
    * AFTER training). Returns the symbol array. */
  def segment(word: Column, merges: Seq[Merge]): Column =
    symbols(merges.sortBy(_.rank).foldLeft(wrapChars(word)) { (seg, m) =>
      org.apache.spark.sql.functions.replace(seg,
        lit(wrap(m.lhs) + wrap(m.rhs)), lit(wrap(m.lhs + m.rhs)))
    })

  /** Per-document BPE SYMBOL STREAM under the trained merges:
    * `(idCol, pos, tok)` with `pos` the 0-based document-order symbol
    * position — the input shape [[graft.pipeline.Packing
    * .exportShardsOf]] consumes, making the binary loader export run
    * under the REAL tokenizer instead of the whitespace stand-in.
    *
    * Scale shape: segmentation is applied DICTIONARY-side — each
    * unique word runs the replace chain once, then joins back to word
    * occurrences by key (the q114 vocabCounts argument); the only
    * per-occurrence work is one bounded per-DOC window (symbol-count
    * prefix over word positions) and a row-local explode. No
    * corpus-scale CodegenFallback lambdas.
    */
  def symbolStream(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val id = col(idCol)
    val occ = docs.select(id,
      posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("wpos", "word")))
    val dict = occ.select(col("word")).distinct()
      .withColumn("syms", segment(col("word"), merges))
      .withColumn("nsym", size(col("syms")).cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(id).orderBy(col("wpos"))
    occ.join(dict, Seq("word"))
      .withColumn("base", sum(col("nsym")).over(w) - col("nsym"))
      .select(id, col("base"),
        posexplode(col("syms")).as(Seq("spos", "tok")))
      .select(id, (col("base") + col("spos")).as("pos"), col("tok"))
  }

  /** VOCABULARY artifact of the trained tokenizer: `(token, id, n)`
    * with contiguous ids from 0 assigned by (count DESC, token ASC) —
    * the vocab file a loader pairs with the binary token export
    * (q183/q184: bin + idx + vocab is the complete loader artifact
    * set). The rank rides the two-phase global row number — a real
    * vocab is hundreds of thousands of entries, never worth a
    * single-partition sort, and the order is total so ids are
    * deterministic on any layout.
    */
  def vocab(docs: DataFrame, textCol: String,
      merges: Seq[Merge]): DataFrame =
    graft.operators.Ranking.globalRowNumber(
        vocabCounts(docs, textCol, merges)
          .withColumn("__negn", -col("n")),
        Seq("__negn", "token"), "id")
      .select(col("token"), (col("id") - 1L).cast("int").as("id"),
        col("n"))

  /** Corpus token counts under the trained merges, DICTIONARY-side:
    * each unique word runs the replace chain once and its symbol
    * counts weight by word frequency — equal by construction to
    * segmenting every occurrence (each word segments
    * deterministically), at 1/|occurrences per word| of the replace
    * work and with the token aggregation shuffling dict-sized rows
    * instead of corpus-sized ones (guide §2.3 aggregate-before-
    * shuffle; the [[symbolStream]] memoization applied to counting). */
  def vocabCounts(docs: DataFrame, textCol: String,
      merges: Seq[Merge]): DataFrame =
    docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("__wf"))
      .select(col("__wf"), explode(segment(col("word"), merges)).as("token"))
      .groupBy(col("token")).agg(sum(col("__wf")).as("n"))

  /** Tokenizer FERTILITY report — the metric a tokenizer choice is
    * judged by per data source (tokens per word; its inverse,
    * characters per token, is the compression rate): under-trained
    * merges fragment rare-vocabulary sources into near-character
    * sequences, inflating their effective token cost in every
    * downstream budget (q96's waterfill, q91's packing). Per source:
    * doc/word/token/char counts (exact integers) and the two ratios
    * (one double division each).
    *
    * Shape: one tokenize+explode scan, the replace chain run
    * DICTIONARY-side (once per unique word, joined back to the
    * occurrences — [[graft.text.Unigram.fertilityReport]]'s shape;
    * per-word symbol counts are deterministic, so the per-source sums
    * are identical to segmenting every occurrence), and one map-side-
    * combinable per-source aggregate; `n_chars` counts word characters
    * (whitespace excluded by construction).
    */
  def fertilityReport(docs: DataFrame, srcCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val src = col(srcCol)
    val occ = docs
      .select(src, explode(TextAnalysis.tokens(col(textCol))).as("word"))
    val dict = occ.select(col("word")).distinct()
      .withColumn("n_sym", size(segment(col("word"), merges)).cast("long"))
      .withColumn("n_chr", length(col("word")).cast("long"))
    val per = occ.join(dict, Seq("word"))
      .groupBy(src).agg(
        count(lit(1)).as("n_words"),
        sum(col("n_sym")).as("n_tokens"),
        sum(col("n_chr")).as("n_chars"))
    docs.groupBy(src).agg(count(lit(1)).as("n_docs"))
      .join(per, Seq(srcCol))
      .select(src, col("n_docs"), col("n_words"), col("n_tokens"),
        col("n_chars"),
        (col("n_tokens").cast("double") / col("n_words").cast("double"))
          .as("fertility"),
        (col("n_chars").cast("double") / col("n_tokens").cast("double"))
          .as("chars_per_token"))
  }
}
