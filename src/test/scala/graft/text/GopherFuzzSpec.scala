package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Differential fuzz: [[GopherQuality.signals]] against a plain-Scala
  * reference of the exact rule formulas, over seeded random documents
  * mixing stop words, numerics, hashes, ellipses, bullets, blank
  * lines and irregular whitespace — the PageRankFuzzSpec posture for
  * the quality gate (9 output columns compared exactly, fractions
  * included: both sides compute the same integer counts and one
  * double division).
  */
class GopherFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val Stops = Seq("the", "a", "of", "and", "is")

  private case class Ref(nTok: Long, meanWl: Double, symRatio: Double,
      bulletFrac: Double, ellipFrac: Double, alphaFrac: Double,
      nStop: Long, keep: Boolean)

  private def ref(text: String, minTok: Long, maxTok: Long): Ref = {
    val toks = text.trim.split("\\s+").filter(_.nonEmpty).toSeq
    val nTok = toks.length.toLong
    val sumLen = toks.map(_.length.toLong).sum
    val nAlpha = toks.count(_.exists(c =>
      (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z'))).toLong
    val nStop = toks.map(_.toLowerCase).distinct.count(Stops.contains)
      .toLong
    val lines = text.split("\n", -1).toSeq.filter(_.trim.nonEmpty)
    val nLines = lines.length.toLong
    val nBullet = lines.count { l =>
      val t = l.trim; t.startsWith("-") || t.startsWith("*")
    }.toLong
    val ellipRe = java.util.regex.Pattern.compile("\\.\\.\\.\\s*$")
    val nEllip = lines.count(l => ellipRe.matcher(l).find()).toLong
    val nHash = text.count(_ == '#').toLong
    val nEdots =
      (text.length - text.replaceAll("\\.\\.\\.", "").length).toLong / 3
    def frac(n: Long, d: Long) = if (d > 0) n.toDouble / d.toDouble else 0.0
    Ref(nTok, frac(sumLen, nTok), frac(nHash + nEdots, nTok),
      frac(nBullet, nLines), frac(nEllip, nLines), frac(nAlpha, nTok),
      nStop,
      nTok >= minTok && nTok <= maxTok &&
        sumLen >= 3 * nTok && sumLen <= 10 * nTok &&
        10 * (nHash + nEdots) <= nTok &&
        10 * nBullet <= 9 * nLines &&
        10 * nEllip <= 3 * nLines &&
        10 * nAlpha >= 8 * nTok &&
        nStop >= 2)
  }

  test("40 random mixed documents match the plain-Scala reference " +
      "on all nine columns") {
    val rnd = new scala.util.Random(20260815L)
    val vocab = Seq("the", "of", "and", "a", "is", "word", "item",
      "chart", "w123", "99", "#", "...", "x...", "##", "longerword",
      "ab", "be", "to", "-", "mid...dle")
    val docs = (1L to 40L).map { i =>
      val nLines = rnd.nextInt(8)
      val text = (0 until nLines).map { _ =>
        val bullet = if (rnd.nextInt(4) == 0) "- " else ""
        val n = rnd.nextInt(15)
        val words = Seq.fill(n)(vocab(rnd.nextInt(vocab.length)))
        val sep = if (rnd.nextInt(5) == 0) "  " else " "
        val tail = if (rnd.nextInt(4) == 0) "..." else ""
        val blank = rnd.nextInt(6) == 0
        if (blank) "   " else bullet + words.mkString(sep) + tail
      }.mkString("\n")
      (i, text)
    }
    val got = GopherQuality.signals(docs.toDF("doc_id", "text"),
        "doc_id", "text", minTok = 5L, maxTok = 40L,
        stopwords = Stops)
      .orderBy("doc_id").collect()
    assert(got.length == 40)
    got.foreach { r =>
      val text = docs(r.getLong(0).toInt - 1)._2
      val e = ref(text, 5L, 40L)
      val clue = s"doc ${r.getLong(0)}: <<$text>>"
      assert(r.getLong(1) == e.nTok, clue)
      assert(r.getDouble(2) == e.meanWl, clue)
      assert(r.getDouble(3) == e.symRatio, clue)
      assert(r.getDouble(4) == e.bulletFrac, clue)
      assert(r.getDouble(5) == e.ellipFrac, clue)
      assert(r.getDouble(6) == e.alphaFrac, clue)
      assert(r.getLong(7) == e.nStop, clue)
      assert(r.getBoolean(8) == e.keep, clue)
    }
  }
}
