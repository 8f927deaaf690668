package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** Randomized properties of the MinHash-LSH near-dup path. The planted
  * corpora behind q20 are oracle-checked; this drives RANDOM corpora
  * against a plain-Scala shingle-set reference:
  *  - soundness: the exact-verify stage means every emitted pair
  *    really has shingle-set Jaccard >= threshold (LSH banding only
  *    ever loses candidates, never invents pairs);
  *  - exact-duplicate recall is 1: identical text -> identical
  *    signature -> identical bands -> candidate -> Jaccard 1;
  *  - pairs are canonical (a < b, no self pairs, no duplicates).
  */
class DedupPropertySpec extends SparkSpec {

  private val vocab = Vector("key", "agg", "row", "scan", "slow", "fast",
    "table", "value", "part", "hash", "join", "sort", "spill", "batch",
    "window", "spark", "order", "data", "column", "filter", "small",
    "merge", "plan", "disk", "shard", "token", "byte", "node")

  private def shingleSet(text: String): Set[String] = {
    val t = text.trim.split("\\s+").filter(_.nonEmpty)
    (0 to t.length - 3).map(i => t.slice(i, i + 3).mkString(" ")).toSet
  }

  private def corpus(seed: Int): Seq[(Long, String)] = {
    val rnd = new Random(seed)
    val base = (0L until 120L).map { i =>
      i -> Seq.fill(3 + rnd.nextInt(25))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    }
    // planted exact dups and near-dups (one token appended)
    val exact = base.filter(_._1 % 9 == 0)
      .map { case (i, t) => (i + 1000L) -> t }
    val near = base.filter(_._1 % 7 == 0)
      .map { case (i, t) => (i + 2000L) -> (t + " " + vocab(rnd.nextInt(vocab.size))) }
    base ++ exact ++ near
  }

  for (seed <- Seq(11, 42, 77)) test(s"random corpus properties (seed $seed)") {
    val spark0 = spark
    import spark0.implicits._
    val rows = corpus(seed)
    val docs = rows.toDF("doc_id", "text")
    val got = Dedup.minhashNearDuplicates(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val sets = rows.toMap.view.mapValues(shingleSet).toMap

    // canonical pairs
    val keys = got.map(p => (p._1, p._2))
    assert(keys.distinct.length == keys.length, "duplicate pairs")
    got.foreach { case (a, b, _) => assert(a < b, s"non-canonical ($a,$b)") }

    // soundness: emitted Jaccard matches the reference sets exactly
    got.foreach { case (a, b, j) =>
      val (sa, sb) = (sets(a), sets(b))
      val inter = (sa intersect sb).size
      val ref = inter.toDouble / (sa.size + sb.size - inter)
      assert(ref >= 0.5, s"pair ($a,$b) below threshold: $ref")
      assert(math.abs(ref - j) < 1e-12, s"jaccard mismatch ($a,$b): $j vs $ref")
    }

    // exact-duplicate recall: every planted identical pair appears
    val found = keys.toSet
    rows.filter(r => r._1 % 9 == 0 && r._1 < 1000 && sets(r._1).nonEmpty)
      .foreach { case (i, _) =>
        assert(found.contains((i, i + 1000L)),
          s"exact dup ($i,${i + 1000}) missed")
      }
  }
}
