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
}
