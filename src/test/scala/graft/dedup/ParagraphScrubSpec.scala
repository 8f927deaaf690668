package graft.dedup

import graft.SparkSpec

class ParagraphScrubSpec extends SparkSpec {
  import spark.implicits._

  private val boiler = "subscribe now"

  test("drops paragraphs above maxDf, keeps order, reports counts") {
    val docs = Seq(
      (1L, s"alpha one\n$boiler\nbeta two"),
      (2L, s"$boiler\ngamma three"),
      (3L, s"delta four\n$boiler"),
      (4L, "epsilon five")).toDF("doc_id", "text")
    val got = Dedup.scrubFrequentParagraphs(docs, "doc_id", "text", 2L)
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "alpha one\nbeta two", 3L, 1L),
      (2L, "gamma three", 2L, 1L),
      (3L, "delta four", 2L, 1L),
      (4L, "epsilon five", 1L, 0L)))
  }

  test("df is doc-distinct: in-doc repetition cannot promote a line") {
    val docs = Seq(
      (1L, "same line\nsame line\nsame line\nunique a"),
      (2L, "unique b")).toDF("doc_id", "text")
    // df("same line") = 1 <= maxDf=1: kept despite 3 occurrences
    val got = Dedup.scrubFrequentParagraphs(docs, "doc_id", "text", 1L)
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect()
    assert(got(0)._2 == "same line\nsame line\nsame line\nunique a")
    assert(got(0)._4 == 0L)
  }

  test("all-boilerplate doc yields empty text, never NULL; blank lines dropped") {
    val docs = Seq(
      (1L, s"$boiler\n\n  \n$boiler"),
      (2L, boiler), (3L, boiler)).toDF("doc_id", "text")
    val got = Dedup.scrubFrequentParagraphs(docs, "doc_id", "text", 2L)
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect()
    assert(got(0) == ((1L, "", 2L, 2L))) // blanks not counted as paras
  }
}
