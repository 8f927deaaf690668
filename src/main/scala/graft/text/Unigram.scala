package graft.text

import graft.functions.UnigramOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) tokenizer — the second trained
  * tokenizer family next to BPE ([[Bpe]]): instead of greedy merges, a
  * PIECE INVENTORY with unigram costs is EM-fitted and words segment by
  * VITERBI (minimum total cost). Kudo 2018 ("Subword Regularization")
  * is the published reference; here the whole fit/apply loop is exact
  * integer arithmetic so the DuckDB oracle replays it bit-identically:
  *
  *   - SEED: all substrings up to [[MaxPieceLen]] chars, counted with
  *     word frequency weights (one dict-sized pass); top `seedKeep` by
  *     (count DESC, piece ASC) plus every single character (coverage).
  *   - COST: `cost(p) = bitlen(N) − bitlen(max(count, 1))` with
  *     `bitlen = length(bin(x))` — the integer-quantized −log₂
  *     probability; N = Σ counts of the round's inventory. Unknown
  *     single chars cost `bitlen(N) + 1` (one bit worse than a
  *     count-1 piece) — total coverage on unseen data.
  *   - EM (hard): each round Viterbi-segments the unique-word dict
  *     under the current costs ([[UnigramOps.segment]] — the referenced-
  *     object expression, O(1) plan size in the inventory), recounts
  *     pieces from the segmentations (freq-weighted), prunes to the
  *     top `roundKeep` used pieces (+ single chars), and re-derives
  *     costs. Unused pieces get no count — the EM prune.
  *   - APPLY: Viterbi under the final inventory; per-word results join
  *     back to word occurrences by key (the [[Bpe.symbolStream]]
  *     dict-side argument), so the corpus-scale path never runs the DP
  *     per occurrence.
  *
  * Scale shape: the corpus is touched once (tokenize + word count);
  * every EM round is dict-sized and fully distributed; the only driver
  * traffic is the model-sized inventory collect per round (the BPE /
  * centroid bounded-collect contract).
  */
object Unigram {

  val MaxPieceLen = 4
  val SeedKeep = 256
  val RoundKeep = 128

  /** piece → (count, cost); `unkCost` for out-of-inventory chars. */
  final case class Model(pieces: Map[String, Long],
      costs: Map[String, Int], unkCost: Int) {
    def segmentCol(word: Column): Column =
      UnigramOps.segmentCol(word, costs, MaxPieceLen, unkCost)
  }

  private def bitlen(x: Long): Int =
    64 - java.lang.Long.numberOfLeadingZeros(math.max(x, 1L))

  /** Counts → (costs, unkCost): the round's integer cost table. */
  private def costsOf(counts: Map[String, Long]): (Map[String, Int], Int) = {
    val n = counts.values.sum
    val bn = bitlen(n)
    (counts.map { case (p, c) => p -> (bn - bitlen(c)) }, bn + 1)
  }

  /** The unique-word frequency dictionary — the single corpus pass. */
  def wordDict(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Top `keep` of an aggregated (piece, cnt) relation by
    * (cnt DESC, piece ASC) — the deterministic prune both engines
    * share — plus every single character (coverage floor), collected
    * (model-sized).
    */
  private def keepInventory(aggregated: DataFrame, chars: DataFrame,
      keep: Int): Map[String, Long] = {
    val top = aggregated
      .orderBy(col("cnt").desc, col("piece").asc)
      .limit(keep).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val singles = chars
      .join(aggregated, Seq("piece"), "left")
      .select(col("piece"), coalesce(col("cnt"), lit(0L)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    (top ++ singles).toMap
  }

  /** Train on the corpus: seed + `rounds` hard-EM rounds. */
  def train(docs: DataFrame, textCol: String, rounds: Int = 2,
      seedKeep: Int = SeedKeep, roundKeep: Int = RoundKeep): Model = {
    val dict = wordDict(docs, textCol).localCheckpoint()
    val positions = dict.select(col("word"), col("freq"),
      explode(sequence(lit(1), length(col("word")))).as("i"))
    val chars = positions
      .select(expr("substr(word, i, 1)").as("piece")).distinct()
      .localCheckpoint()
    val subs = positions
      .select(col("freq"), col("i"), col("word"),
        explode(sequence(lit(1), lit(MaxPieceLen))).as("l"))
      .filter(col("i") + col("l") - 1 <= length(col("word")))
      .select(expr("substr(word, i, l)").as("piece"), col("freq"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
    var inv = keepInventory(subs, chars, seedKeep)
    var (costs, unk) = costsOf(inv)
    var r = 0
    while (r < rounds) {
      val model = Model(inv, costs, unk)
      val counted = dict
        .select(col("freq"),
          explode(model.segmentCol(col("word"))).as("piece"))
        .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
      inv = keepInventory(counted, chars, roundKeep)
      val cu = costsOf(inv)
      costs = cu._1; unk = cu._2
      r += 1
    }
    Model(inv, costs, unk)
  }

  /** The trained inventory as a relation: (piece, n, cost). */
  def inventory(docs: DataFrame, model: Model): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    model.pieces.toSeq
      .map { case (p, c) => (p, c, model.costs(p).toLong) }
      .toDF("piece", "n", "cost")
  }

  /** Per-document stats under the model: `(idCol, n_words, n_tokens,
    * enc_cost)` — token count and total encoding cost (the unigram-LM
    * codelength, summed over word occurrences). Segmentation runs
    * dict-side; occurrences join by word key.
    */
  def docStats(docs: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame = {
    val id = col(idCol)
    val occ = docs.select(id,
      explode(TextAnalysis.tokens(col(textCol))).as("word"))
    val dict = occ.select(col("word")).distinct()
      .withColumn("syms", model.segmentCol(col("word")))
    val spark = docs.sparkSession
    import spark.implicits._
    val costRel = model.costs.toSeq.toDF("piece", "pcost")
    val perWord = dict
      .select(col("word"), explode(col("syms")).as("piece"))
      .join(costRel, Seq("piece"), "left")
      .withColumn("pcost",
        coalesce(col("pcost"), lit(model.unkCost)).cast("long"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n_sym"), sum(col("pcost")).as("w_cost"))
    occ.join(perWord, Seq("word"))
      .groupBy(id)
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_sym")).as("n_tokens"),
        sum(col("w_cost")).as("enc_cost"))
  }

  /** Per-document unigram SYMBOL STREAM under the model: `(idCol,
    * pos, tok)` with `pos` the 0-based document-order symbol position
    * — the [[graft.pipeline.Packing.exportShardsOf]] input shape, so
    * the binary loader export runs under the unigram tokenizer exactly
    * as it does under BPE ([[Bpe.symbolStream]], whose dict-side
    * segmentation + per-doc window shape this mirrors).
    */
  def symbolStream(docs: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame = {
    val id = col(idCol)
    val occ = docs.select(id,
      posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("wpos", "word")))
    val dict = occ.select(col("word")).distinct()
      .withColumn("syms", model.segmentCol(col("word")))
      .withColumn("nsym", size(col("syms")).cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(id).orderBy(col("wpos"))
    occ.join(dict, Seq("word"))
      .withColumn("base", sum(col("nsym")).over(w) - col("nsym"))
      .select(id, col("base"),
        posexplode(col("syms")).as(Seq("spos", "tok")))
      .select(id, (col("base") + col("spos")).as("pos"), col("tok"))
  }

  /** Corpus token counts under the model, DICTIONARY-side: the
    * Viterbi DP runs once per unique word and its symbols weight by
    * word frequency — identical to the per-occurrence form by
    * determinism of the DP, at 1/|occurrences per word| of the DP
    * work ([[Bpe.vocabCounts]]'s memoization, guide §2.3).
    */
  def vocabCounts(docs: DataFrame, textCol: String,
      model: Model): DataFrame =
    docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("__wf"))
      .select(col("__wf"), explode(model.segmentCol(col("word"))).as("token"))
      .groupBy(col("token")).agg(sum(col("__wf")).as("n"))

  /** VOCABULARY artifact of the trained tokenizer: `(token, id, n)`
    * with contiguous ids from 0 by (count DESC, token ASC) — the
    * [[Bpe.vocab]] contract under the second family, riding the
    * two-phase global row number (no single-partition sort at real
    * vocab sizes; total order → layout-deterministic ids).
    */
  def vocab(docs: DataFrame, textCol: String, model: Model): DataFrame =
    graft.operators.Ranking.globalRowNumber(
        vocabCounts(docs, textCol, model)
          .withColumn("__negn", -col("n")),
        Seq("__negn", "token"), "id")
      .select(col("token"), (col("id") - 1L).cast("int").as("id"),
        col("n"))

  /** Tokenizer fertility per source under the model — [[Bpe
    * .fertilityReport]]'s twin, so the two trained tokenizer families
    * compare on the same metric.
    */
  def fertilityReport(docs: DataFrame, srcCol: String, textCol: String,
      model: Model): DataFrame = {
    val src = col(srcCol)
    val occ = docs
      .select(src, explode(TextAnalysis.tokens(col(textCol))).as("word"))
    val dict = occ.select(col("word")).distinct()
      .withColumn("n_sym", size(model.segmentCol(col("word"))).cast("long"))
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
