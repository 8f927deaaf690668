package graft.quality

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property check: the engine's character-histogram signals equal a
  * plain-Scala reference on randomly generated corpora (mixed
  * alphabets, repeats, whitespace runs, single chars).
  */
class EntropyPropertySpec extends SparkSpec {

  private def refSignals(text: String): (Long, Long, Long) = {
    val h = text.groupBy(identity).map { case (_, g) => g.length.toLong }
    (h.sum, h.size.toLong, h.map(c => c * c).sum)
  }

  test("random corpora: engine signals == plain-Scala histogram") {
    import spark.implicits._
    val rnd = new Random(20260814L)
    val alphabets = Seq("ab", "abcdefgh \t", "xyz0123456789!?.,", "q")
    val docs = (1L to 120L).map { id =>
      val a = alphabets(rnd.nextInt(alphabets.length))
      val n = 1 + rnd.nextInt(400)
      (id, (0 until n).map(_ => a(rnd.nextInt(a.length))).mkString)
    }
    val got = Entropy.charSignals(docs.toDF("doc_id", "text"),
        "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    docs.foreach { case (id, t) =>
      assert(got(id) === refSignals(t), s"doc $id: '$t'")
    }
  }

  test("classification is scale-invariant in the text (repeat k times)") {
    import spark.implicits._
    val rnd = new Random(7L)
    val base = (1L to 30L).map { id =>
      (id, (0 until 40 + rnd.nextInt(60))
        .map(_ => ('a' + rnd.nextInt(6)).toChar).mkString)
    }
    // coll(text repeated k) == coll(text): counts scale k, n scales k
    val once = Entropy.gate(base.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    val thrice = Entropy.gate(
        base.map { case (id, t) => (id, t * 3) }.toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(once === thrice)
  }
}
