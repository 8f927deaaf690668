package graft.text

import graft.SparkSpec
import graft.functions.UnigramOps
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer: Viterbi kernel exactness (the oracle DP's
  * twin), EM training invariants, coverage.
  */
class UnigramSpec extends SparkSpec {

  import spark.implicits._

  private def seg(word: String, costs: Map[String, Int],
      unk: Int = 9): Seq[String] = {
    val df = Seq(Tuple1(word)).toDF("w")
      .select(UnigramOps.segmentCol(col("w"), costs, 4, unk).as("s"))
    df.head().getSeq[String](0)
  }

  private val inv = Map("b" -> 5, "a" -> 3, "n" -> 4, "an" -> 4,
    "ana" -> 5, "ban" -> 6, "na" -> 4)

  test("Viterbi picks the minimum-cost segmentation") {
    // ban+ana = 11 beats b+an+an+a = 16 and b+a+n+a+n+a = 22
    assert(seg("banana", inv) == Seq("ban", "ana"))
    assert(seg("ban", inv) == Seq("ban"))
    assert(seg("a", inv) == Seq("a"))
  }

  test("unknown single characters segment at unk cost (total coverage)") {
    assert(seg("zq", inv) == Seq("z", "q"))
    assert(seg("azb", inv) == Seq("a", "z", "b"))
  }

  test("ties break to fewer pieces, then to the shorter last piece") {
    // cd vs c+d equal cost: fewer pieces wins
    val m1 = Map("c" -> 2, "d" -> 2, "cd" -> 4)
    assert(seg("cd", m1) == Seq("cd"))
    // [ab, c] vs [a, bc]: equal cost, equal pieces — the DP resolves
    // position 3 first: last piece c (l=1) vs bc (l=2) tie on
    // (cost, pieces) -> smaller l wins -> [ab, c]
    val m2 = Map("a" -> 3, "b" -> 3, "c" -> 3, "ab" -> 3, "bc" -> 3)
    assert(seg("abc", m2) == Seq("ab", "c"))
  }

  test("segmentation always reassembles the word") {
    val docs = Seq((1L, "the quick brown fox ran over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "the dog ran over the box"))
      .toDF("doc_id", "text")
    val model = Unigram.train(docs, "text")
    val words = Unigram.wordDict(docs, "text")
      .withColumn("syms", model.segmentCol(col("word")))
      .select(col("word"), concat_ws("", col("syms")).as("glued"))
      .collect()
    words.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("training keeps every single character and only used pieces") {
    val docs = Seq((1L, "aaab aaab aaab bbba"), (2L, "aaab ccc"))
      .toDF("doc_id", "text")
    val model = Unigram.train(docs, "text")
    Seq("a", "b", "c").foreach(c =>
      assert(model.costs.contains(c), s"alphabet char $c missing"))
    // every inventory piece beyond the single chars was USED by the
    // final EM round's segmentations (the prune contract)
    val segged = Unigram.wordDict(docs, "text")
      .withColumn("p", explode(model.segmentCol(col("word"))))
      .select(col("p")).distinct().collect().map(_.getString(0)).toSet
    model.pieces.keys.filter(_.length > 1).foreach { p =>
      assert(model.pieces(p) > 0, s"unused multi-char piece $p kept")
    }
    assert(segged.subsetOf(model.costs.keySet))
  }

  test("frequent substrings become single pieces") {
    val docs = Seq((1L, ("prefixation " * 30).trim)).toDF("doc_id", "text")
    val model = Unigram.train(docs, "text")
    val pieces = seg("prefixation",
      model.costs, model.unkCost)
    // 11 chars, pieces up to 4 chars: minimum 3 pieces; the dominant
    // word must not fragment to characters
    assert(pieces.length <= 4, s"fragmented: $pieces")
  }

  test("docStats: token counts and encoding cost are consistent") {
    val docs = Seq((1L, "one two two three"), (2L, "three three one"))
      .toDF("doc_id", "text")
    val model = Unigram.train(docs, "text")
    val st = Unigram.docStats(docs, "doc_id", "text", model)
      .orderBy(col("doc_id")).collect()
    assert(st(0).getAs[Long]("n_words") == 4L)
    assert(st(1).getAs[Long]("n_words") == 3L)
    st.foreach { r =>
      assert(r.getAs[Long]("n_tokens") >= r.getAs[Long]("n_words"))
      assert(r.getAs[Long]("enc_cost") >= 0L)
    }
  }
}
