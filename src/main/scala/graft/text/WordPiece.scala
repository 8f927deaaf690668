package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WordPiece tokenizer training — the LIKELIHOOD-scored merge family
  * (BERT lineage), completing the trained-tokenizer trio: BPE picks
  * the most FREQUENT adjacent pair ([[Bpe]]), unigram-LM prunes a
  * seeded inventory by EM ([[Unigram]]), WordPiece picks the pair
  * maximizing `count(ab) / (count(a)·count(b))` — the pair whose merge
  * most raises corpus likelihood under a unigram model, preferring
  * strongly-associated pairs over merely common ones.
  *
  * The score is ordered by an exact-integer FIXED-POINT key,
  *
  *   key = (((c_ab · 2^30) div c_a) · 2^30) div c_b
  *
  * — truncating div both engines, so the replay is bit-exact. The two
  * sequential divisions lose at most 2^-30 relative precision per
  * step; pairs whose keys still collide resolve by the deterministic
  * (lhs, rhs) tie-break IDENTICALLY in both engines, so cross-engine
  * agreement never depends on the precision (the same argument as
  * IVF-PQ's kCodes: a documented engineering constant, not a hazard).
  * `c_ab ≤ min(c_a, c_b)` holds by construction; `c_ab · 2^30` fits
  * int64 for any corpus under 2^31 token occurrences (enforced loudly
  * — tokenizer training at 100 TB samples its input, as SentencePiece
  * does; the cap is per-trainer-input, not per-corpus).
  *
  * Scale shape = [[Bpe.trainMerges]]': the corpus is touched once
  * (word-frequency dictionary); each round is dict-sized — a pair
  * groupBy, a symbol-count groupBy, two broadcast-able joins, ONE
  * collected argmax row — and the dict is localCheckpoint'd per round.
  */
object WordPiece {

  val Scale = 1073741824L // 2^30

  final case class Merge(rank: Int, lhs: String, rhs: String,
      count: Long, key: Long)

  /** Learn `numMerges` WordPiece merges. */
  def trainMerges(docs: DataFrame, textCol: String,
      numMerges: Int): Seq[Merge] = {
    var dict = Bpe.wordDict(docs, textCol).localCheckpoint()
    val total = dict.agg(sum(col("freq"))).head().getLong(0)
    require(total < (1L << 31),
      s"WordPiece fixed-point scoring needs < 2^31 token occurrences " +
        s"in the trainer input (got $total): sample the corpus first")
    val out = Seq.newBuilder[Merge]
    var i = 1
    var done = false
    while (i <= numMerges && !done) {
      val syms = Bpe.symbols(col("seg"))
      val sym = dict
        .select(col("freq"), explode(syms).as("sym"))
        .groupBy(col("sym")).agg(sum(col("freq")).as("scnt"))
      val pairs = dict
        .select(col("freq"), syms.as("syms"))
        .withColumn("n", size(col("syms")))
        .filter(col("n") >= 2)
        .select(col("freq"),
          explode(sequence(lit(1), col("n") - 1)).as("j"),
          col("syms"))
        .select(col("freq"),
          element_at(col("syms"), col("j")).as("lhs"),
          element_at(col("syms"), col("j") + 1).as("rhs"))
        .groupBy(col("lhs"), col("rhs"))
        .agg(sum(col("freq")).as("cnt"))
      val best = pairs
        .join(sym.select(col("sym").as("lhs"), col("scnt").as("ca")),
          Seq("lhs"))
        .join(sym.select(col("sym").as("rhs"), col("scnt").as("cb")),
          Seq("rhs"))
        .withColumn("key",
          expr(s"(((cnt * $Scale) div ca) * $Scale) div cb"))
        .orderBy(col("key").desc, col("lhs").asc, col("rhs").asc)
        .limit(1)
        .select(col("lhs"), col("rhs"), col("cnt"), col("key"))
        .collect()
      if (best.isEmpty) done = true
      else {
        val r = best(0)
        out += Merge(i, r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3))
        val prev = dict
        dict = dict
          .withColumn("seg", org.apache.spark.sql.functions.replace(
            col("seg"),
            lit(Bpe.Sep + r.getString(0) + Bpe.Sep +
              Bpe.Sep + r.getString(1) + Bpe.Sep),
            lit(Bpe.Sep + r.getString(0) + r.getString(1) + Bpe.Sep)))
          .localCheckpoint()
        prev.unpersist()
        i += 1
      }
    }
    out.result()
  }

  /** Merges as a DataFrame: (rank, lhs, rhs, merged, pair_count,
    * score_key).
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int)
      : DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    trainMerges(docs, textCol, numMerges)
      .map(m => (m.rank, m.lhs, m.rhs, m.lhs + m.rhs, m.count, m.key))
      .toDF("rank", "lhs", "rhs", "merged", "pair_count", "score_key")
  }

  /** Apply trained merges to a word column — the rank-ordered replace
    * chain ([[Bpe.segment]]'s semantics; greedy left-to-right under
    * the separator wrap). Returns the symbol array.
    */
  def segment(word: org.apache.spark.sql.Column, merges: Seq[Merge])
      : org.apache.spark.sql.Column =
    Bpe.segment(word, merges.map(toBpe))

  /** Per-document WordPiece symbol stream `(idCol, pos, tok)` — the
    * [[graft.pipeline.Packing.exportShardsOf]] input shape
    * ([[Bpe.symbolStream]]'s dictionary-side segmentation under these
    * merges).
    */
  def symbolStream(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame =
    Bpe.symbolStream(docs, idCol, textCol, merges.map(toBpe))

  private def toBpe(m: Merge): Bpe.Merge =
    Bpe.Merge(m.rank, m.lhs, m.rhs, m.count)
}
