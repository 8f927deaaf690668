package graft.functions

import java.security.MessageDigest

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Native text-hash expressions: parity with the composed (and
  * oracle-pinned) formulations they replaced, plus edge cases.
  */
class TextHashSpec extends SparkSpec {

  import spark.implicits._

  private def refLow60(s: String): Long =
    BigInt(MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .take(8).map("%02x".format(_)).mkString.take(15), 16).toLong

  test("shingleHash60 equals conv(substr(md5(shingle),1,15),16,10) per shingle") {
    val docs = Seq(
      "the quick brown fox jumps",
      "a b c",
      "a b",              // too short for 3-grams -> empty
      "x  y\tz  x  y\tz", // duplicate shingle collapses
      ""
    ).toDF("text")
    val got = docs.select(TextHash.shingleHash60(col("text"), 3).as("hs"))
      .collect().map(_.getSeq[Long](0))
    // reference: tokens -> 3-gram strings -> md5 low60, dedup keep-first
    def ref(text: String): Seq[Long] = {
      val toks = text.split("\\s+").filter(_.nonEmpty)
      toks.sliding(3).filter(_.length == 3).map(_.mkString(" "))
        .map(refLow60).toSeq.distinct
    }
    val texts = Seq("the quick brown fox jumps", "a b c", "a b",
      "x  y\tz  x  y\tz", "")
    got.zip(texts.map(ref)).foreach { case (g, r) => assert(g == r) }
  }

  test("shingleHash60 matches the SQL-composed oracle formulation on real docs") {
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.001", "documents")
    val native = docs.select(col("doc_id"),
        explode(TextHash.shingleHash60(col("text"), 3)).as("sh"))
    val composed = docs
      .select(col("doc_id"), explode({
        val toks = graft.text.TextAnalysis.tokens(col("text"))
        val len = greatest(size(toks) - 2, lit(0))
        val slices = (1 to 3).map(k => slice(toks, lit(k), len))
        slices.reduce((acc, s) => zip_with(acc, s, (a, b) => concat(a, lit(" "), b)))
      }).as("shingle"))
      .distinct()
      .select(col("doc_id"), PortableHash.hash60Base(col("shingle")).as("sh"))
    assert(native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty)
  }

  test("simhash16 is row-local-equal to the vote formulation and null on empty") {
    val df = Seq("hello world hello", "  ", "one", "a b c d e").toDF("text")
    val got = df.select(TextHash.simhash16(col("text"))).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getLong(0)))
    def ref(text: String): Option[Long] = {
      val toks = text.split("\\s+").filter(_.nonEmpty)
      if (toks.isEmpty) None
      else {
        val votes = new Array[Int](16)
        toks.foreach { t =>
          val h16 = (refLow60("2:" + t) & 0xffffL).toInt
          (0 until 16).foreach(j => votes(j) += (((h16 >> j) & 1) * 2) - 1)
        }
        Some((0 until 16).map(j => if (votes(j) > 0) 1L << j else 0L).sum)
      }
    }
    assert(got.toSeq == Seq("hello world hello", "  ", "one", "a b c d e").map(ref))
  }

  test("rollingHash matches the codepoint recurrence incl. multibyte") {
    def ref(s: String): Long = {
      var acc = 0L
      s.codePoints().forEach(cp => acc = (acc * 257 + cp) % 2147483647L)
      acc
    }
    val inputs = Seq("abc", "", "héllo wörld", "a", "日本語 test")
    val got = inputs.toDF("t")
      .select(TextHash.rollingFingerprint(col("t"))).collect().map(_.getLong(0))
    assert(got.toSeq == inputs.map(ref))
  }

  test("fuzz: native expressions match reference semantics on arbitrary text") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // mixed alphabet: words, ASCII whitespace incl. \x0B, punctuation,
    // multibyte codepoints (no surrogates — valid strings only)
    val piece = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(6)),
      Gen.oneOf(" ", "\t", "\n", "\u000B", "\f", "\r", "  "),
      Gen.oneOf(",", "!", "…", "día", "日本", "wörld", "_"))
    val genText = Gen.listOf(piece).map(_.mkString)

    def refTokens(s: String): Array[String] =
      s.split("\\s+").filter(_.nonEmpty)

    val prop = Prop.forAll(genText) { s =>
      val df = Seq(s).toDF("t")
      val row = df.select(
        TextHash.shingleHash60(col("t"), 3).as("sh"),
        TextHash.simhash16(col("t")).as("sim"),
        TextHash.rollingFingerprint(col("t")).as("rh")).head()

      val toks = refTokens(s)
      val expSh = toks.sliding(3).filter(_.length == 3)
        .map(g => refLow60(g.mkString(" "))).toSeq.distinct
      val expSim =
        if (toks.isEmpty) None
        else {
          val votes = new Array[Int](16)
          toks.foreach { t =>
            val h16 = (refLow60("2:" + t) & 0xffffL).toInt
            (0 until 16).foreach(j => votes(j) += (((h16 >> j) & 1) * 2) - 1)
          }
          Some((0 until 16).map(j => if (votes(j) > 0) 1L << j else 0L).sum)
        }
      var acc = 0L
      s.codePoints().forEach(cp => acc = (acc * 257 + cp) % 2147483647L)

      row.getSeq[Long](0) == expSh &&
        (if (row.isNullAt(1)) expSim.isEmpty else expSim.contains(row.getLong(1))) &&
        row.getLong(2) == acc
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }

  test("expressions reject non-string input at analysis") {
    val df = Seq(1L).toDF("x")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(TextHash.shingleHash60(col("x"), 3)).collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(TextHash.simhash16(col("x"))).collect()
    }
  }
}
