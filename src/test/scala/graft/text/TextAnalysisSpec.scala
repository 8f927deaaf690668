package graft.text

import graft.SparkSpec
import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** Edge-case contract of the codegen tokenizer: must behave exactly like
  * `filter(split(text,'\s+'), _ != "")` (the oracle formulation) on
  * inputs the real corpus never produces.
  */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  val edgy = Seq(
    (1L, "plain words here"),
    (2L, "  leading and   collapsed\t\twhitespace  "),
    (3L, ""),
    (4L, "   \t  "),
    (5L, "single"),
    (6L, "two words")
  ).toDF("doc_id", "text")

  test("tokens == filter(split) reference semantics on edge inputs") {
    val got = edgy.select(col("doc_id"),
      TextAnalysis.tokens(col("text")).as("t"))
    val ref = edgy.select(col("doc_id"),
      filter(split(col("text"), "\\s+"), t => t =!= lit("")).as("t"))
    assert(got.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      === ref.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap)
    assert(got.filter(col("doc_id") === 3).head.getSeq[String](1).isEmpty)
    assert(got.filter(col("doc_id") === 4).head.getSeq[String](1).isEmpty)
  }

  test("native langId bit-matches the regex formulation on the corpus + edges") {
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("text"))
      .unionByName(Seq(
        "",                     // no tokens -> und
        "the THE the,the!",     // case + punctuation boundaries
        "der die und ist das the a of and is", // exact tie -> first language
        "a",                    // single one-letter marker
        "theology android island: markers as substrings must NOT count",
        "el y es una los",      // es
        "café the café", // non-ASCII splits word runs
        "x_the the_x _the the_" // underscore is a word char -> no boundary
      ).toDF("text"))
    val both = docs.select(
      TextAnalysis.langId(col("text")).as("native"),
      TextAnalysis.langIdRegex(col("text")).as("regex"))
    assert(both.filter(col("native") =!= col("regex")).count() === 0)
  }

  test("shingles skip docs shorter than n and handle empty text") {
    val sh = Dedup.shingles(edgy, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byDoc = sh.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byDoc.get(3).isEmpty && byDoc.get(4).isEmpty) // empty docs
    assert(byDoc.get(5).isEmpty && byDoc.get(6).isEmpty) // < 3 tokens
    assert(byDoc(1) === Set("plain words here"))
    assert(byDoc(2) === Set("leading and collapsed",
      "and collapsed whitespace"))
  }
}
