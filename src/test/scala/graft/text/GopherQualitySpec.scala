package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gopher quality rules: each rule fails ALONE on a planted doc whose
  * other signals pass, boundary cases sit exactly on the integer
  * thresholds, and the empty/edge docs report zeros.
  *
  * Output columns by index: 0 doc_id, 1 n_tok, 2 mean_word_len,
  * 3 symbol_ratio, 4 bullet_frac, 5 ellipsis_frac, 6 alpha_frac,
  * 7 n_stop, 8 gopher_keep.
  */
class GopherQualitySpec extends SparkSpec {

  private def sig(minTok: Long, rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    GopherQuality.signals(rows.toDF("doc_id", "text"),
      "doc_id", "text", minTok = minTok)
      .orderBy("doc_id").collect()
  }

  // a clean passing doc: 10 words, two stop words, all alphabetic
  private val good = "the quick brown foxes of meadow run fast every day"

  test("clean doc passes; every signal is the exact fraction") {
    val d = sig(5L, 1L -> good)(0)
    assert(d.getLong(1) == 10L)
    assert(d.getDouble(2) == 41.0 / 10.0) // total chars 41
    assert(d.getDouble(3) == 0.0 && d.getDouble(4) == 0.0 &&
      d.getDouble(5) == 0.0)
    assert(d.getDouble(6) == 1.0)
    assert(d.getLong(7) == 2L) // the, of
    assert(d.getBoolean(8))
  }

  test("word-count rule fails alone (below minTok)") {
    val d = sig(5L, 1L -> "the end of it")(0) // 4 words < 5
    assert(d.getLong(1) == 4L && !d.getBoolean(8))
  }

  test("mean-word-length rule: integer boundary at exactly 3 and 10") {
    // five 3-char words (sum 15 = 3*5): boundary PASSES
    val d3 = sig(2L, 1L -> "the and big cat dog")(0)
    assert(d3.getDouble(2) == 3.0 && d3.getBoolean(8))
    // 2-char words: mean 2 < 3 fails
    val d2 = sig(2L, 1L -> "to of at in on my we us")(0)
    assert(!d2.getBoolean(8))
  }

  test("symbol rule: exactly 0.1 passes, above fails; ellipsis counted") {
    // 10 tokens, 1 hash: 10*1 <= 10 -> boundary passes
    val pass = sig(5L,
      1L -> "the mark # sits of nine other words right here")(0)
    assert(pass.getDouble(3) == 1.0 / 10.0 && pass.getBoolean(8))
    // 10 tokens, 2 hashes: 10*2 > 10 -> fails
    val fail = sig(5L,
      1L -> "the marks # # sit of seven other words here")(0)
    assert(!fail.getBoolean(8))
    // '...' counts as a symbol occurrence via length arithmetic
    val dots = sig(5L,
      1L -> ("the tale of stuff... and more... plus extra... " +
        "wow... again... over..."))(0)
    assert(dots.getDouble(3) == 6.0 / 11.0)
    assert(!dots.getBoolean(8))
  }

  test("bullet rule fails alone; 90% boundary passes") {
    // 10 lines, 10 bullets -> 1.0 > 0.9 fails (other rules pass:
    // the only non-alpha token per line is the bullet itself, 6/7)
    val all = Seq.fill(10)("- the item of alpha beta chart")
      .mkString("\n")
    val d = sig(5L, 1L -> all)(0)
    assert(d.getDouble(4) == 1.0 && !d.getBoolean(8))
    // 9 bullets of 10 lines: 10*9 <= 9*10 boundary passes
    val nine = (Seq.fill(9)("- the item of alpha beta chart") :+
      "the closing line of prose").mkString("\n")
    val d9 = sig(5L, 1L -> nine)(0)
    assert(d9.getDouble(4) == 9.0 / 10.0 && d9.getBoolean(8))
  }

  test("ellipsis-line rule fails alone; 30% boundary passes") {
    val bad = Seq(
      "the start of something grand here",
      "it continues soon...",
      "more to come later...").mkString("\n")
    val d = sig(5L, 1L -> bad)(0)
    assert(d.getDouble(5) == 2.0 / 3.0)
    assert(!d.getBoolean(8))
    // 3 of 10 lines: 10*3 <= 3*10 boundary passes
    val ten = ((1 to 7)
      .map(i => s"the plain line of number $i") ++
      (1 to 3).map(i => s"the trailing line $i goes on..."))
      .mkString("\n")
    val d10 = sig(5L, 1L -> ten)(0)
    assert(d10.getDouble(5) == 3.0 / 10.0 && d10.getBoolean(8))
  }

  test("alphabetic-word rule: 80% boundary passes, below fails") {
    // 8 alpha of 10: 10*8 >= 8*10 boundary passes
    val d8 = sig(5L,
      1L -> "the big group of words here now 99 111 ok")(0)
    assert(d8.getDouble(6) == 8.0 / 10.0 && d8.getBoolean(8))
    val d7 = sig(5L,
      1L -> "the big group of words here 77 99 111 ok")(0)
    assert(!d7.getBoolean(8))
  }

  test("stop-word rule: needs TWO DISTINCT stop words") {
    // 'the' repeated is ONE distinct stop word -> fails
    val d1 = sig(5L,
      1L -> "the word the word the word the word again")(0)
    assert(d1.getLong(7) == 1L && !d1.getBoolean(8))
    val d2 = sig(5L,
      1L -> "the word and word word word word word again")(0)
    assert(d2.getLong(7) == 2L && d2.getBoolean(8))
  }

  test("empty and whitespace docs report zeros and fail") {
    val out = sig(5L, 1L -> "", 2L -> "  \n ")
    assert(out.length == 2)
    for (d <- out) {
      assert(d.getLong(1) == 0L && d.getDouble(2) == 0.0 &&
        d.getLong(7) == 0L && !d.getBoolean(8))
    }
  }

  test("pipeline gopherGate: band off = identity; band removes only " +
      "rule-failing docs and reads cfg.stopwords") {
    val s = spark
    import s.implicits._
    import graft.pipeline.CorpusPipeline
    val docs = Seq(
      (1L, "the quick brown foxes of meadow run fast every day"),
      // bullet flood: passes the row gates' shape, fails gopher
      (2L, Seq.fill(10)("- the item of alpha beta chart").mkString("\n")))
      .toDF("doc_id", "text")
    val off = CorpusPipeline.gopherGate(docs, "doc_id", "text",
      CorpusPipeline.Config())
    assert(off.orderBy("doc_id").collect().toSeq ==
      docs.orderBy("doc_id").collect().toSeq)
    val on = CorpusPipeline.gopherGate(docs, "doc_id", "text",
      CorpusPipeline.Config(gopher = Some((5L, 100000L))))
    assert(on.select("doc_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("deterministic under repartitioning") {
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.001",
      "documents").select(col("doc_id"), col("text"))
    val a = GopherQuality.signals(docs, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val b = GopherQuality.signals(
        docs.repartition(7), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
}
