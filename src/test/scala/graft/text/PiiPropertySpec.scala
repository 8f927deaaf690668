package graft.text

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property checks for the PII pass: the engine's Luhn expression
  * agrees with a plain-Scala reference on random card numbers, and
  * scrubbing is idempotent (placeholders contain no PII patterns).
  */
class PiiPropertySpec extends SparkSpec {

  private def refLuhn(digits: String): Boolean = {
    val tot = digits.zipWithIndex.map { case (ch, i) =>
      val d = ch - '0'
      if ((i + 1) % 2 == 1) { val t = d * 2; if (t > 9) t - 9 else t }
      else d
    }.sum
    tot % 10 == 0
  }

  test("random 16-digit numbers: engine Luhn == plain-Scala Luhn") {
    import spark.implicits._
    val rnd = new Random(421L)
    val nums = (1 to 200).map(_ => (1 to 16).map(_ => rnd.nextInt(10)).mkString)
    val texts = nums.zipWithIndex.map { case (n, i) =>
      val sep = i % 3 match {
        case 0 => n
        case 1 => n.grouped(4).mkString(" ")
        case _ => n.grouped(4).mkString("-")
      }
      (i.toLong, s"pay $sep now", n)
    }
    val got = texts.map(t => (t._1, t._2)).toDF("id", "t")
      .select(col("id"), size(Pii.validCards(col("t"))).as("nv"),
        size(Pii.cardMatches(col("t"))).as("ns"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    texts.foreach { case (id, _, digits) =>
      assert(got(id)._2 === 1, s"card-shaped not detected: $digits")
      assert((got(id)._1 === 1) === refLuhn(digits),
        s"Luhn mismatch on $digits")
    }
  }

  test("scrub is idempotent on PII-laden text") {
    import spark.implicits._
    val samples = Seq(
      "a@b.com 10.0.0.1 +1-555-0147 DE44500105175407324931 " +
        "4539 1488 0343 6467 and 4111111111111111",
      "no pii at all", "x@y.org x@y.org 4539-1488-0343-6468")
    val out = samples.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
      .select(Pii.scrub(col("t")).as("once"))
      .select(col("once"), Pii.scrub(col("once")).as("twice"))
      .collect()
    out.foreach(r => assert(r.getString(0) === r.getString(1)))
  }
}
