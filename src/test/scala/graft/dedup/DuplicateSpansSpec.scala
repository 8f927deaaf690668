package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Span-level exact duplicate detection on a handcrafted corpus with
  * known span extents.
  */
class DuplicateSpansSpec extends SparkSpec {

  private def df(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def run(rows: (Long, String)*) =
    Dedup.duplicateSpans(df(rows: _*), "doc_id", "text", k = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(4), r.getLong(5)))).toMap

  test("verbatim copy marks every gram; unique doc marks none") {
    val a = "w1 w2 w3 w4 w5 w6"
    val out = run(1L -> a, 2L -> a, 3L -> "u1 u2 u3 u4 u5")
    // 6 tokens, k=3 -> 4 gram starts, all duplicated, one merged span
    assert(out(1L) == ((4L, 4L, 1L, 6L)))
    assert(out(2L) == ((4L, 4L, 1L, 6L)))
    assert(out(3L) == ((3L, 0L, 0L, 0L)))
  }

  test("shared interior phrase yields one span with the right extent") {
    // docs share exactly tokens "p1 p2 p3 p4" (starts at different
    // offsets); 2 duplicated starts merge into one 4-token span
    val out = run(
      1L -> "a1 a2 p1 p2 p3 p4 a3",
      2L -> "b1 p1 p2 p3 p4 b2 b3 b4")
    assert(out(1L)._2 == 2L && out(1L)._3 == 1L && out(1L)._4 == 4L)
    assert(out(2L)._2 == 2L && out(2L)._3 == 1L && out(2L)._4 == 4L)
  }

  test("two separated shared phrases stay two spans") {
    val out = run(
      1L -> "p1 p2 p3 x1 x2 x3 q1 q2 q3",
      2L -> "p1 p2 p3 y1 y2 y3 q1 q2 q3")
    assert(out(1L)._3 == 2L && out(1L)._4 == 3L)
    assert(out(2L)._3 == 2L && out(2L)._4 == 3L)
  }

  test("within-document repetition is caught too") {
    val out = run(1L -> "r1 r2 r3 z9 r1 r2 r3")
    // "r1 r2 r3" occurs twice inside one doc -> both starts duplicated
    assert(out(1L)._2 == 2L && out(1L)._3 == 2L && out(1L)._4 == 3L)
  }

  test("maxDf excludes the planted hot gram, keeps real duplicate spans") {
    // "h1 h2 h3" is boilerplate across 6 docs (df=6); "p1 p2 p3" is a
    // genuine pair-duplicate (df=2). With maxDf=4 the hot gram must not
    // mark spans; the pair-duplicate still must.
    val boiler = (1L to 6L).map(i => i -> s"h1 h2 h3 u${i}a u${i}b u${i}c")
    val pair = Seq(100L -> "x1 x2 p1 p2 p3 x3",
      101L -> "y1 p1 p2 p3 y2 y3")
    val rows = boiler ++ pair
    val capped = Dedup.duplicateSpans(df(rows: _*), "doc_id", "text",
        k = 3, maxDf = 4L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert((1L to 6L).forall(capped(_) == 0L),
      "hot gram above maxDf must mark no spans")
    assert(capped(100L) == 1L && capped(101L) == 1L,
      "pair duplicate below maxDf must survive the cap")
    // uncapped: the boilerplate IS flagged (df 6 > 1)
    val uncapped = Dedup.duplicateSpans(df(rows: _*), "doc_id", "text",
        k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert((1L to 6L).forall(uncapped(_) == 1L))
  }

  test("docs shorter than k are absent") {
    val out = run(1L -> "s1 s2", 2L -> "t1 t2 t3 t4")
    assert(!out.contains(1L) && out.contains(2L))
  }

  test("fuzz: matches a plain-Scala reference on random small corpora") {
    // tiny alphabet forces k-gram collisions both within and across docs
    def ref(docs: Seq[(Long, String)], k: Int)
        : Map[Long, (Long, Long, Long, Long)] = {
      val grams = docs.flatMap { case (id, text) =>
        text.split("\\s+").filter(_.nonEmpty).sliding(k)
          .filter(_.length == k).zipWithIndex
          .map { case (g, i) => (id, i, g.mkString(" ")) }.toSeq
      }
      val counts = grams.groupBy(_._3).view.mapValues(_.size).toMap
      grams.groupBy(_._1).map { case (id, gs) =>
        val dupPos = gs.filter(g => counts(g._3) > 1).map(_._2).sorted
        val spans = dupPos.foldLeft(List.empty[(Int, Int)]) { (acc, p) =>
          acc match {
            case (s, e) :: rest if p == e + 1 => (s, p) :: rest
            case _                            => (p, p) :: acc
          }
        }
        val lens = spans.map { case (s, e) => e - s + k }
        id -> ((gs.size.toLong, dupPos.size.toLong, spans.size.toLong,
          (if (lens.isEmpty) 0 else lens.max).toLong))
      }
    }
    for (seed <- Seq(7, 42, 1234)) {
      val rnd = new scala.util.Random(seed)
      val docs = (0 until 8).map { i =>
        val n = rnd.nextInt(26)
        i.toLong -> (0 until n).map(_ => s"t${rnd.nextInt(12)}")
          .mkString(" ")
      }
      val got = run(docs: _*)
      assert(got == ref(docs, 3), s"seed $seed")
    }
  }

  test("scrubDuplicateSpans removes exactly the duplicated spans") {
    // docs share "p1 p2 p3" (k=3): the shared run is removed from both;
    // unique tokens survive in order; a span-free doc passes through
    val out = Dedup.scrubDuplicateSpans(df(
        1L -> "a1 a2 p1 p2 p3 a3",
        2L -> "b1 p1 p2 p3 b2 b3",
        3L -> "u1 u2 u3 u4"), "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "a1 a2 a3")
    assert(out(2L) == "b1 b2 b3")
    assert(out(3L) == "u1 u2 u3 u4")
  }

  test("scrub of a full verbatim copy empties both docs") {
    val a = "w1 w2 w3 w4"
    val out = Dedup.scrubDuplicateSpans(df(1L -> a, 2L -> a),
        "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "" && out(2L) == "")
  }

  test("scrub respects maxDf: hot boilerplate is NOT removed") {
    val boiler = (1L to 6L).map(i => i -> s"h1 h2 h3 u${i}a u${i}b")
    val out = Dedup.scrubDuplicateSpans(df(boiler: _*),
        "doc_id", "text", k = 3, maxDf = 4L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert((1L to 6L).forall(i => out(i) == s"h1 h2 h3 u${i}a u${i}b"))
  }

  test("scrubCrossSpans removes eval passages, keeps within-train dups") {
    val train = df(
      1L -> "t1 t2 e1 e2 e3 t3",     // quotes the eval passage
      2L -> "s1 s2 s3 u1 u2 u3",     // shares s1 s2 s3 with doc 3 only
      3L -> "s1 s2 s3 v1 v2 v3",     //   (within-train dup: NOT scrubbed)
      4L -> "w1 w2 w3 w4 w5 w6")     // clean
    val ev = df(10L -> "e1 e2 e3", 11L -> "x1 x2 x3")
    val out = Dedup.scrubCrossSpans(train, "doc_id", "text",
        ev, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "t1 t2 t3")
    assert(out(2L) == "s1 s2 s3 u1 u2 u3")
    assert(out(3L) == "s1 s2 s3 v1 v2 v3")
    assert(out(4L) == "w1 w2 w3 w4 w5 w6")
  }

  test("scrubCrossSpans: full copy empties; combined-df cap guards boilerplate") {
    val a = "c1 c2 c3 c4"
    val out = Dedup.scrubCrossSpans(df(1L -> a), "doc_id", "text",
        df(10L -> a), "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "")
    // gram "h1 h2 h3" occurs 5x combined (> maxDf 4) -> kept
    val train = df((1L to 4L).map(i => i -> s"h1 h2 h3 z${i}a z${i}b"): _*)
    val out2 = Dedup.scrubCrossSpans(train, "doc_id", "text",
        df(10L -> "h1 h2 h3"), "doc_id", "text", k = 3, maxDf = 4L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert((1L to 4L).forall(i => out2(i) == s"h1 h2 h3 z${i}a z${i}b"))
  }

  private def report(train: Seq[(Long, String)], ev: Seq[(Long, String)],
      maxDf: Long = 0L) =
    Dedup.crossContaminationReport(df(train: _*), "doc_id", "text",
        df(ev: _*), "doc_id", "text", k = 3, maxDf = maxDf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap

  test("contamination report: full copy 10^6 ppm, partial exact, fresh 0") {
    val train = Seq(1L -> "t1 t2 t3 t4 t5 t6")
    val ev = Seq(
      10L -> "t1 t2 t3 t4 t5 t6",          // full copy
      11L -> "t1 t2 t3 x1 x2 x3",          // 3-token prefix leaked
      12L -> "f1 f2 f3 f4 f5 f6")          // fresh
    val out = report(train, ev)
    assert(out(10L) == ((6L, 6L, 1000000L)))
    assert(out(11L) == ((6L, 3L, 500000L)))
    assert(out(12L) == ((6L, 0L, 0L)))
  }

  test("contamination report: overlapping spans count positions once") {
    // eval grams at starts 0 and 2 both leak (start 1's gram does not):
    // spans [0,3) and [2,5) overlap at position 2 -> covered 5, not 6
    val train = Seq(1L -> "a b c q1 q2", 2L -> "c d e q3 q4")
    val ev = Seq(10L -> "a b c d e z9")
    val out = report(train, ev)
    assert(out(10L) == ((6L, 5L, 833333L)))
  }

  test("contamination report: combined-df cap excludes boilerplate; " +
      "every eval doc gets a row") {
    // "h1 h2 h3" occurs 5x combined (> maxDf 4): not counted as leak
    val train = (1L to 4L).map(i => i -> s"h1 h2 h3 z${i}a z${i}b")
    val ev = Seq(10L -> "h1 h2 h3", 11L -> "n1 n2")  // 11: < k tokens
    val out = report(train, ev, maxDf = 4L)
    assert(out(10L) == ((3L, 0L, 0L)))
    assert(out(11L) == ((2L, 0L, 0L)))   // too short to gram — still reported
  }
}
