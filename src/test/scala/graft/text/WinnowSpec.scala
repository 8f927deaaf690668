package graft.text

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Winnowing vs an independent plain-Scala implementation (explicit
  * window scan with rightmost-min, no packed-key trick), plus the
  * paper's selection guarantee on planted matches.
  */
class WinnowSpec extends SparkSpec {

  private val (k, w) = (3, 4)

  private def md5Hash40(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16) % (1L << 40)
  }

  private def refWinnow(text: String): Set[(Long, Long)] = {
    val toks = text.trim.split("\\s+").filter(_.nonEmpty)
    if (toks.length < k) return Set.empty
    val hs = (0 to toks.length - k)
      .map(i => md5Hash40(toks.slice(i, i + k).mkString(" ")))
    def rightmostMin(from: Int, until: Int): (Long, Long) = {
      var best = -1
      for (i <- from until until)
        if (best < 0 || hs(i) <= hs(best)) best = i
      (best.toLong, hs(best))
    }
    if (hs.length < w) Set(rightmostMin(0, hs.length))
    else (0 to hs.length - w).map(j => rightmostMin(j, j + w)).toSet
  }

  private def docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    .select(col("doc_id"), col("text"))

  test("equals the plain-Scala reference on the corpus") {
    val got = Winnow.fingerprints(docs, "doc_id", "text", k, w)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val want = docs.collect()
      .map(r => r.getLong(0) -> refWinnow(r.getString(1)))
      .filter(_._2.nonEmpty).toMap
    assert(got == want)
  }

  test("selection guarantee: a shared >= w+k-1 token run shares a fingerprint") {
    val spark0 = spark
    import spark0.implicits._
    // two docs sharing a 6-token run (w + k - 1 = 6) amid distinct text
    val shared = "alpha beta gamma delta epsilon zeta"
    val d = Seq(
      (1L, s"one two three $shared four five six"),
      (2L, s"seven eight $shared nine ten eleven twelve"),
      (3L, "entirely different words with no overlap at all"))
      .toDF("doc_id", "text")
    val fp = Winnow.fingerprints(d, "doc_id", "text", k, w)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val by = fp.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((by(1L) intersect by(2L)).nonEmpty, "shared run must collide")
    assert((by(1L) intersect by(3L)).isEmpty, "disjoint docs must not")
  }

  test("short docs still fingerprint; empty docs do not") {
    val spark0 = spark
    import spark0.implicits._
    val d = Seq((1L, "just three tokens"), (2L, "a b"), (3L, ""))
      .toDF("doc_id", "text")
    val fp = Winnow.fingerprints(d, "doc_id", "text", k, w)
      .collect().map(_.getLong(0)).toSet
    assert(fp == Set(1L)) // 1 gram -> partial window; <k tokens -> none
  }

  test("matches: planted copies pair with correct extents; maxDf caps " +
      "boilerplate") {
    val spark0 = spark
    import spark0.implicits._
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val boiler = "lorem ipsum dolor sit" // in EVERY doc -> hot fps
    val d = (1L to 12L).map { i =>
      val own = s"own$i a$i b$i c$i d$i e$i f$i"
      val t =
        if (i <= 2) s"$boiler $shared $own" // 1,2 share an 8-token run
        else s"$boiler $own"
      (i, t)
    }.toDF("doc_id", "text")
    val fps = Winnow.fingerprints(d, "doc_id", "text", k, w)
    val m = Winnow.matches(fps, "doc_id", minShared = 1, maxDf = 6)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // the boilerplate prefix appears in all 12 docs -> df 12 > 6 ->
    // capped; only the planted 8-token run should match
    assert(m.keySet == Set((1L, 2L)), m.toString)
    val (n, aFrom, aTo) = m((1L, 2L))
    assert(n >= 1)
    // every shared fingerprint lies inside the shared run's gram span
    // (tokens 4..11 -> gram starts 2..9: a gram at pos p spans p..p+2,
    // and selected grams must start at >= boilerplate length - k + 1)
    assert(aFrom >= 2 && aTo <= 9, s"extent [$aFrom,$aTo]")
  }

  test("layout-independent") {
    def run(d: org.apache.spark.sql.DataFrame) =
      Winnow.fingerprints(d, "doc_id", "text", k, w)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(docs) == run(docs.repartition(13)))
  }

  test("crossMatches: span copies localize, fresh docs and within-" +
      "corpus pairs never match, id spaces may overlap") {
    val spark0 = spark
    import spark0.implicits._
    val src = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val train = Seq(
      1L -> s"train one $src and a much longer own continuation here",
      2L -> "train two totally different content about other things",
      // train-internal duplicate pair — must NOT surface cross-corpus
      3L -> "dup pair x1 x2 x3 x4 x5 x6 x7 x8",
      4L -> "dup pair x1 x2 x3 x4 x5 x6 x7 x8").toDF("doc_id", "text")
    val eval = Seq(
      // id 1 REUSED on the eval side: overlapping id spaces
      1L -> s"copied span $src then a wholly fresh ending",
      9L -> "fresh eval doc sharing nothing with the train corpus")
      .toDF("doc_id", "text")
    val fT = Winnow.fingerprints(train, "doc_id", "text", k, w)
    val fE = Winnow.fingerprints(eval, "doc_id", "text", k, w)
    val m = Winnow.crossMatches(fT, fE, "doc_id", minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // only the span copy matches, and only against its source
    assert(m == Set((1L, 1L)), m.toString)
    // the winnowing guarantee held ACROSS corpora for the 10-token run
    val ext = Winnow.crossMatches(fT, fE, "doc_id", minShared = 1)
      .collect().head
    assert(ext.getLong(2) >= 1 && ext.getLong(3) >= 0)
  }
}
