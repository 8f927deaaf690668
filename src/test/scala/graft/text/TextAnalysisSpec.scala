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

  test("unicode canonical form: NFC==NFD fingerprints, non-Latin " +
      "text survives, ASCII fast path unchanged") {
    val nfc = "Caf\u00e9 \u03b4\u03bf\u03ba\u03b9\u03bc\u03ae"
    val nfd = "Cafe\u0301 \u03b4\u03bf\u03ba\u03b9\u03bc\u03b7\u0301"
    assert(nfc != nfd) // genuinely different byte sequences
    val rows = Seq(
      (1L, nfc), (2L, nfd),
      // non-Latin only: must NOT degrade to empty
      (3L, "\u041f\u0440\u0438\u0432\u0435\u0442, \u043c\u0438\u0440!"),
      (4L, "plain ascii. text")
    ).toDF("doc_id", "text")
      .withColumn("u", TextAnalysis.normalizedUnicode(col("text")))
      .withColumn("fu", TextAnalysis.fingerprintUnicode(col("text")))
      .withColumn("fb", TextAnalysis.fingerprint(col("text")))
      .collect().map(r => r.getLong(0) ->
        (r.getString(2), r.getString(3), r.getString(4))).toMap
    // NFC and NFD variants: same unicode fingerprint...
    assert(rows(1L)._2 == rows(2L)._2)
    // ...where the a-z-only byte fingerprint sees two documents
    // ("caf" vs "cafe" after its strip)
    assert(rows(1L)._3 != rows(2L)._3)
    // non-Latin survives (normalized() strips it to "")
    assert(rows(3L)._1 ==
      "\u043f\u0440\u0438\u0432\u0435\u0442 \u043c\u0438\u0440")
    // ASCII: unicode form == classic form (fast path, same contract)
    val classic = Seq((4L, "plain ascii. text")).toDF("doc_id", "text")
      .select(TextAnalysis.normalized(col("text"))).collect().head.getString(0)
    assert(rows(4L)._1 == classic)
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
