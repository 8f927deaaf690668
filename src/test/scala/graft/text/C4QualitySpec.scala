package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class C4QualitySpec extends SparkSpec {
  import spark.implicits._

  private def cleanOf(docs: Seq[(Long, String)],
      badWords: Seq[String] = Nil) =
    C4Quality.clean(docs.toDF("doc_id", "text"), "doc_id", "text",
      badWords = badWords)
      .collect().map(r => r.getLong(0) -> r).toMap

  test("each line rule fires alone on a planted fixture") {
    val good = "this is a good long sentence."
    val doc = Seq(
      good,                           // kept
      "no terminal punctuation here", // dropped: no terminal punct
      "too short.",                   // dropped: < 3 words
      "please enable javascript to continue.", // dropped: js line
      "ends with a question mark?",   // kept
      "\"a quoted full sentence.\""   // kept (end quote)
    ).mkString("\n")
    val r = cleanOf(Seq((1L, doc)))(1L)
    assert(r.getAs[Long]("n_lines") == 6L)
    assert(r.getAs[Long]("n_lines_kept") == 3L)
    val clean = r.getAs[String]("clean_text")
    assert(clean.split("\n").toSeq == Seq(good,
      "ends with a question mark?", "\"a quoted full sentence.\""))
  }

  test("document gates: brace, lorem ipsum, bad word, sentence floor") {
    val five = (1 to 5).map(i => s"sentence number $i is here.")
      .mkString("\n")
    val m = cleanOf(Seq(
      (1L, five),                                   // kept
      (2L, five + "\nvar x = { a: 1 };"),           // brace → drop
      (3L, five + "\nsome Lorem Ipsum filler text."), // lorem → drop
      (4L, five + "\nthis mentions forbiddenword sadly."), // bad word
      (5L, "only two sentences. here they are.")    // < 5 sentences
    ), badWords = Seq("forbiddenword"))
    assert(m(1L).getAs[Boolean]("c4_keep"))
    assert(m(2L).getAs[Boolean]("has_brace") &&
      !m(2L).getAs[Boolean]("c4_keep"))
    assert(m(3L).getAs[Boolean]("has_lorem") &&
      !m(3L).getAs[Boolean]("c4_keep"))
    assert(m(4L).getAs[Boolean]("has_bad") &&
      !m(4L).getAs[Boolean]("c4_keep"))
    assert(!m(5L).getAs[Boolean]("c4_keep") &&
      m(5L).getAs[Long]("n_sent") == 2L)
  }

  test("zero-survivor docs report empty clean text, not a missing row") {
    val m = cleanOf(Seq((1L, "no punct at all\nstill none")))
    assert(m(1L).getAs[String]("clean_text") == "")
    assert(m(1L).getAs[Long]("n_lines_kept") == 0L)
    assert(m(1L).getAs[Long]("n_sent") == 0L)
  }

  test("sentence count is terminal marks in RETAINED text only") {
    // the dropped javascript line carries a '.' that must not count
    val doc = "a good first sentence. with two marks! here.\n" +
      "javascript line with a period."
    val m = cleanOf(Seq((1L, doc)))
    assert(m(1L).getAs[Long]("n_sent") == 3L)
  }

  test("pipeline c4Gate: None is the identity, Some removes only c4 failures") {
    import graft.pipeline.CorpusPipeline
    val five = (1 to 5).map(i => s"sentence number $i is here.")
      .mkString("\n")
    val gated = Seq(
      (1L, five),
      (2L, five + "\nvar x = { a: 1 };"),
      (3L, "no punctuation lines at all\nstill none here"))
      .toDF("doc_id", "text")
    val idOff = CorpusPipeline.c4Gate(gated, "doc_id", "text",
      CorpusPipeline.Config())
    assert(idOff.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L))
    val on = CorpusPipeline.c4Gate(gated, "doc_id", "text",
      CorpusPipeline.Config(c4 = Some(CorpusPipeline.C4Gate())))
    assert(on.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }
}
