package graft.pipeline

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Leakage-safe splitting: the property that makes it "leakage-safe"
  * (no near-dup pair straddles splits) plus coverage, fallback, and
  * layout determinism.
  */
class SplitsSpec extends SparkSpec {

  private def docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    .select(col("doc_id"), col("text"))

  // planted dups: every 5th doc cloned under a shifted id
  private def corpus = docs.unionByName(
    docs.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 500000).as("doc_id"), col("text")))

  private def pairs = graft.dedup.Dedup
    .minhashNearDuplicates(corpus, "doc_id", "text")
    .select(col("a"), col("b"))

  test("no near-dup pair straddles splits; every doc is covered") {
    val split = Splits.byCluster(corpus, "doc_id", pairs)
      .select(col("doc_id"), col("cluster"), col("split"))
    val m = split.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(m.size == corpus.count(), "every doc gets exactly one row")
    val ps = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(ps.nonEmpty, "planted dups must produce pairs")
    ps.foreach { case (a, b) =>
      assert(m(a)._2 == m(b)._2, s"pair ($a,$b) straddles splits")
      assert(m(a)._1 == m(b)._1, s"pair ($a,$b) in different clusters")
    }
    // hash split actually distributes: at 90/5/5 over ~1200 clusters
    // all three splits must be non-empty
    val bySplit = m.values.groupBy(_._2).view.mapValues(_.size).toMap
    assert(bySplit.keySet == Set("train", "val", "test"), bySplit.toString)
    assert(bySplit("train") > bySplit("val"), bySplit.toString)
  }

  test("unpaired docs fall back to singleton clusters") {
    val noPairs = pairs.filter(lit(false))
    val split = Splits.byCluster(docs, "doc_id", noPairs)
    assert(split.filter(col("cluster") =!= col("doc_id")).count() == 0)
  }

  test("deterministic across input layouts") {
    def run(d: org.apache.spark.sql.DataFrame) =
      Splits.byCluster(d, "doc_id", pairs)
        .select(col("doc_id"), col("split")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toSet
    assert(run(corpus) == run(corpus.repartition(13)))
  }

  test("stratifiedExact: per-source counts hit the exact floors") {
    val srcDocs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("source"))
    val split = Splits.stratifiedExact(srcDocs, "doc_id", "source",
      trainPpm = 800000L, valPpm = 100000L)
    val got = split.groupBy(col("source"), col("split")).count()
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val ns = srcDocs.groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ns.nonEmpty)
    ns.foreach { case (src, n) =>
      val kTrain = n * 800000L / 1000000L
      val kVal = n * 900000L / 1000000L - kTrain
      assert(got.getOrElse((src, "train"), 0L) == kTrain,
        s"$src train: ${got.get((src, "train"))} vs $kTrain of $n")
      assert(got.getOrElse((src, "val"), 0L) == kVal)
      assert(got.getOrElse((src, "test"), 0L) == n - kTrain - kVal)
    }
    // ranks are dense 1..n_s per source
    val bad = split.groupBy(col("source"))
      .agg(max(col("src_rank")).as("mx"), count(lit(1)).as("k"))
      .filter(col("mx") =!= col("k")).count()
    assert(bad == 0)
    // deterministic under layout
    def run(d: org.apache.spark.sql.DataFrame) =
      Splits.stratifiedExact(d, "doc_id", "source")
        .select(col("doc_id"), col("split")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toSet
    assert(run(srcDocs) == run(srcDocs.repartition(17)))
  }
}
