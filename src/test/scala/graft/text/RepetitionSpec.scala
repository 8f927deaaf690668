package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Repetition signals: exact counts on planted documents, the
  * single-token/no-gram edge, and the repetitive gate's two triggers.
  */
class RepetitionSpec extends SparkSpec {

  private def df(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("counts and fractions are exact on planted docs") {
    val out = Repetition.signals(df(
      1L -> "a b a b a b",    // 6 toks, 2 unique, grams: "a b"x3 "b a"x2
      2L -> "w x y z"         // all unique, each gram once
    ), "doc_id", "text").orderBy("doc_id").collect()

    val d1 = out(0)
    assert(d1.getLong(1) == 6 && d1.getLong(2) == 2)        // n_tok, n_unique
    assert(d1.getDouble(3) == 2.0 / 6.0)                    // uniq_frac
    assert(d1.getDouble(4) == 3.0 / 6.0)                    // top_tok_frac (a or b: 3)
    assert(d1.getDouble(5) == 3.0 / 5.0)                    // top_gram_frac
    assert(d1.getBoolean(6))                                // repetitive

    val d2 = out(1)
    assert(d2.getLong(1) == 4 && d2.getLong(2) == 4)
    assert(d2.getDouble(5) == 1.0 / 3.0)                    // 3 grams, max 1
    assert(d2.getBoolean(6))                                // gram mass 1/3 > 0.08
  }

  test("single-token doc has NULL gram mass; empty doc is absent") {
    val out = Repetition.signals(df(
      1L -> "solo",
      2L -> "   "
    ), "doc_id", "text").collect()
    assert(out.length == 1)
    val d = out(0)
    assert(d.getLong(1) == 1 && d.isNullAt(5))
    assert(!d.getBoolean(6)) // uniq_frac 1.0, gram mass coalesces to 0
  }

  test("the gate fires on low unique fraction even with spread grams") {
    // 10 tokens, 2 unique -> uniq_frac 0.2 < 0.4
    val out = Repetition.signals(df(
      1L -> "p q q p p q p q q p"), "doc_id", "text").collect()
    assert(out(0).getBoolean(6))
  }

  test("deterministic under repartitioning") {
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.001",
      "documents").select(col("doc_id"), col("text"))
    val a = Repetition.signals(docs, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val b = Repetition.signals(docs.repartition(7), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("bigramFamiliarity: planted common vs rare transitions") {
    import spark.implicits._
    // "c1 c2" occurs 4x corpus-wide (familiar at minDf=3); every other
    // bigram is unique (unfamiliar)
    val docs = Seq(
      (1L, "c1 c2 a1 a2"),   // bigrams: c1c2, c2a1, a1a2 -> 1 familiar / 3
      (2L, "c1 c2 b1"),      // c1c2, c2b1 -> 1 / 2
      (3L, "c1 c2"),         // c1c2 -> 1 / 1
      (4L, "x9 c1 c2"),      // x9c1, c1c2 -> 1 / 2
      (5L, "solo")           // < 2 tokens: absent
    ).toDF("doc_id", "text")
    val out = Repetition.bigramFamiliarity(docs, "doc_id", "text", minDf = 3L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(out(1L) == ((3L, 1L, 1.0 / 3.0)))
    assert(out(2L) == ((2L, 1L, 0.5)))
    assert(out(3L) == ((1L, 1L, 1.0)))
    assert(out(4L) == ((2L, 1L, 0.5)))
    assert(!out.contains(5L))
  }

  // ---- fineSignals ------------------------------------------------
  // Output columns by index: 0 doc_id, 1 n_lines, 2 n_tok,
  // 3 dup_line_frac, 4 dup_line_char_frac, 5 top2_char_frac,
  // 6 top3_char_frac, 7 top4_char_frac, 8 dup5_char_frac,
  // 9 repetitive_fine.

  private def fine(rows: (Long, String)*) =
    Repetition.fineSignals(df(rows: _*), "doc_id", "text")
      .orderBy("doc_id").collect()

  test("fineSignals: dup_line_frac fires alone (short dup line)") {
    // 5 lines, "ab" x3 -> dup_line_frac 2/5 > 0.30; everything else
    // stays under threshold (the dup line is 2 chars of 87)
    val d = fine(1L -> ("ab\nab\nab\n" +
      "one two three four five six seven eight\n" +
      "nine ten eleven twelve thirteen fourteen fifteen sixteen"))(0)
    assert(d.getLong(1) == 5L && d.getLong(2) == 19L)
    assert(d.getDouble(3) == 2.0 / 5.0)        // (5 - 3 distinct) / 5
    assert(d.getDouble(4) == 4.0 / 101.0)      // (3-1)*2 over line chars
    assert(d.getDouble(5) == 8.0 / 87.0)       // "ab ab" x2, glen 4
    assert(d.getDouble(6) == 0.0 && d.getDouble(7) == 0.0)
    assert(d.getDouble(8) == 0.0)
    assert(d.getBoolean(9))
  }

  test("fineSignals: dup_line_char_frac fires alone (long dup line)") {
    // one 60-char single-token line duplicated among 8 distinct
    // 5-char lines: line frac 1/10 <= 0.30, char frac 60/160 > 0.20;
    // single-token lines with distinct neighbors repeat NO n-gram
    val x = "x" * 60
    val shorts = (1 to 8).map(i => f"tok$i%02d").mkString("\n")
    val d = fine(1L -> s"$x\n$shorts\n$x")(0)
    assert(d.getLong(1) == 10L && d.getLong(2) == 10L)
    assert(d.getDouble(3) == 1.0 / 10.0)
    assert(d.getDouble(4) == 60.0 / 160.0)
    assert(d.getDouble(5) == 0.0 && d.getDouble(6) == 0.0 &&
      d.getDouble(7) == 0.0 && d.getDouble(8) == 0.0)
    assert(d.getBoolean(9))
  }

  test("fineSignals: top2_char_frac fires alone (non-adjacent bigram)") {
    // "a b" x5 separated by distinct 2-char fillers: no trigram
    // repeats, no dup lines (single line)
    val d = fine(1L ->
      "a b c1 a b c2 a b c3 a b c4 a b c5")(0)
    assert(d.getLong(1) == 1L && d.getLong(2) == 15L)
    assert(d.getDouble(3) == 0.0 && d.getDouble(4) == 0.0)
    assert(d.getDouble(5) == 10.0 / 20.0)      // 5 * (1+1) over 20 chars
    assert(d.getDouble(6) == 0.0 && d.getDouble(7) == 0.0 &&
      d.getDouble(8) == 0.0)
    assert(d.getBoolean(9))
  }

  test("fineSignals: top3_char_frac fires alone (contained bigrams stay under)") {
    // "a b c" x4 with distinct 9-char fillers: m3 = 12/48 = 0.25 >
    // 0.18 while the contained bigrams give m2 = 8/48 ~ 0.167 <= 0.20
    val f = (1 to 4).map(i => ("f" * 8) + i).mkString(" a b c ")
    val d = fine(1L -> s"a b c $f")(0)
    assert(d.getLong(2) == 16L)
    assert(d.getDouble(5) == 8.0 / 48.0)
    assert(d.getDouble(6) == 12.0 / 48.0)
    assert(d.getDouble(7) == 0.0 && d.getDouble(8) == 0.0)
    assert(d.getBoolean(9))
  }

  test("fineSignals: top4_char_frac fires alone") {
    // "a b c d" x2 with 16-char fillers: m4 = 8/40 = 0.2 > 0.16,
    // m3 = 6/40 = 0.15 <= 0.18, m2 = 4/40 = 0.1 <= 0.20
    val f1 = "e" * 16; val f2 = "g" * 16
    val d = fine(1L -> s"a b c d $f1 a b c d $f2")(0)
    assert(d.getLong(2) == 10L)
    assert(d.getDouble(5) == 4.0 / 40.0)
    assert(d.getDouble(6) == 6.0 / 40.0)
    assert(d.getDouble(7) == 8.0 / 40.0)
    assert(d.getDouble(8) == 0.0)
    assert(d.getBoolean(9))
  }

  test("fineSignals: dup5_char_frac fires alone") {
    // "a b c d e" x2 with 25-char fillers: coverage 10/60 ~ 0.167 >
    // 0.15; contained m4 = 8/60 ~ 0.133 <= 0.16, m3 = 0.1, m2 ~ 0.067
    val f1 = "u" * 25; val f2 = "v" * 25
    val d = fine(1L -> s"a b c d e $f1 a b c d e $f2")(0)
    assert(d.getLong(2) == 12L)
    assert(d.getDouble(5) == 4.0 / 60.0)
    assert(d.getDouble(6) == 6.0 / 60.0)
    assert(d.getDouble(7) == 8.0 / 60.0)
    assert(d.getDouble(8) == 10.0 / 60.0)
    assert(d.getBoolean(9))
  }

  test("fineSignals: overlapping dup-5-gram runs count each position once") {
    // "a a a a a a b": the 5-gram (a,a,a,a,a) occurs at pos 0 and 1
    // (overlapping) -> covered positions 0..5 = 6 chars, NOT 10
    val d = fine(1L -> "a a a a a a b")(0)
    assert(d.getDouble(8) == 6.0 / 7.0)
  }

  test("fineSignals: two grams sharing max mass report that mass once") {
    // "a b" x2 and "c d" x2, both mass 4: the per-size MAX is 4, and
    // the tie cannot make it 8
    val d = fine(1L -> "a b a b c d c d")(0)
    assert(d.getDouble(5) == 4.0 / 8.0)
    assert(d.getDouble(6) == 0.0)
  }

  test("fineSignals: empty, whitespace-only, single-token, single-line docs") {
    val out = fine(
      1L -> "",          // no lines, no tokens
      2L -> "  \n  ",    // whitespace only
      3L -> "solo",      // one token: no grams at all
      4L -> "w x y z w") // single line, all grams unique
    assert(out.length == 4)
    for (d <- out) {
      assert(d.getDouble(3) == 0.0 && d.getDouble(4) == 0.0 &&
        d.getDouble(5) == 0.0 && d.getDouble(6) == 0.0 &&
        d.getDouble(7) == 0.0 && d.getDouble(8) == 0.0)
      assert(!d.getBoolean(9))
    }
    assert(out(0).getLong(1) == 0L && out(0).getLong(2) == 0L)
    assert(out(1).getLong(1) == 0L && out(1).getLong(2) == 0L)
    assert(out(2).getLong(1) == 1L && out(2).getLong(2) == 1L)
    assert(out(3).getLong(1) == 1L && out(3).getLong(2) == 5L)
  }

  test("fineSignals: deterministic under repartitioning") {
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.001",
      "documents").select(col("doc_id"), col("text"))
    val a = Repetition.fineSignals(docs, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val b = Repetition.fineSignals(docs.repartition(7), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
}
