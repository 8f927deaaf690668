package graft.text

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextClassifySpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 64

  /** Plain-Scala replay of bucket + weight + score. */
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def h60(s: String, seed: Int): Long =
    java.lang.Long.parseLong(md5hex(s"$seed:$s").take(15), 16)

  private def bucketOf(tok: String): Long =
    h60(tok, TextClassify.BucketSeed) % Dim

  private def weightOf(bucket: Long): Long =
    h60(bucket.toString, 7) % 2001L - 1000L

  private def expected(text: String): (Long, Long) = {
    val toks = text.split("\\s+").filter(_.nonEmpty)
    (toks.length.toLong, toks.map(t => weightOf(bucketOf(t))).sum)
  }

  private val docs = Seq(
    (1L, "alpha beta gamma delta"),
    (2L, "alpha alpha alpha"), // repeated tokens count per occurrence
    (3L, "  padded   whitespace\ttokens "),
    (4L, "zeta")
  ).toDF("doc_id", "text")

  private def run(num: Long, den: Long) =
    TextClassify.hashedLinear(docs, "doc_id", "text",
      TextClassify.syntheticWeights(spark, Dim), Dim, num, den)
      .orderBy("doc_id").collect()

  test("scores equal the plain-Scala replay, per token occurrence") {
    val rows = run(0, 1)
    assert(rows.length == 4)
    rows.foreach { case Row(id: Long, n: Long, score: Long, _) =>
      val (en, escore) = expected(
        docs.filter(col("doc_id") === id).head().getString(1))
      assert(n == en, s"doc $id tokens")
      assert(score == escore, s"doc $id score")
    }
  }

  test("gate is the exact integer cross-multiplication, ties kept") {
    val Row(_, n1: Long, s1: Long, _) = run(0, 1).head
    // threshold exactly at doc 1's mean weight: s1*den == num*n1 → kept
    val atTie = run(s1, n1).head
    assert(atTie.getBoolean(3), "score*den == num*n_tokens must keep")
    val above = run(s1 + 1, n1).head
    assert(!above.getBoolean(3), "threshold strictly above must drop")
  }

  test("layout independence: scores identical under repartition") {
    val w = TextClassify.syntheticWeights(spark, Dim)
    val a = TextClassify.hashedLinear(docs, "doc_id", "text", w, Dim, 0, 1)
      .orderBy("doc_id").collect().toSeq
    val b = TextClassify.hashedLinear(docs.repartition(7), "doc_id", "text",
      w, Dim, 0, 1).orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("model is data: a different weights relation changes the verdict") {
    val flat = spark.range(Dim).select(col("id").as("bucket"),
      lit(1L).as("weight")) // every token weighs 1 → score == n_tokens
    val rows = TextClassify.hashedLinear(docs, "doc_id", "text",
      flat, Dim, 1, 1).orderBy("doc_id").collect()
    rows.foreach { case Row(_, n: Long, score: Long, keep: Boolean) =>
      assert(score == n && keep)
    }
  }

  test("perceptron training separates a separable labeled corpus") {
    // vocabularies overlap on 'the' so separation is not free
    val pos = (1L to 40L).map(i =>
      (i, s"the quick brown fox number $i jumps over the lazy dog", 1L))
    val neg = (1L to 40L).map(i =>
      (1000L + i, "the offer is free buy now click here " * 2 + s"ref $i",
        -1L))
    val lab = (pos ++ neg).toDF("doc_id", "text", "y")
    val w = TextClassify.trainPerceptron(lab, "doc_id", "text", "y",
      dim = Dim, rounds = 3)
    // dense model relation
    assert(w.count() == Dim)
    // the trained model classifies its training set perfectly
    val scored = TextClassify.hashedLinear(lab, "doc_id", "text", w,
        Dim, 0L, 1L)
      .join(lab.select(col("doc_id"), col("y")), Seq("doc_id"))
    val wrong = scored.filter(
      (col("y") === 1L && !col("keep")) ||
      (col("y") === -1L && col("score") >= 0L)).count()
    assert(wrong == 0, s"$wrong training docs misclassified after 3 rounds")
    // full-batch updates: training is layout-independent
    def weightsOf(d: org.apache.spark.sql.DataFrame) =
      TextClassify.trainPerceptron(d, "doc_id", "text", "y", Dim, 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(weightsOf(lab) == weightsOf(lab.repartition(7)))
  }
}
