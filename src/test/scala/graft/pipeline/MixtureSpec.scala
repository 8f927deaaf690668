package graft.pipeline

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Deterministic mixture sampling: hash-gate membership is exact,
  * nested across thresholds, and independent of layout.
  */
class MixtureSpec extends SparkSpec {

  private def docs = Tables(spark, "/root/testdata/sf0.001", "documents")

  test("full weight keeps everything, zero weight keeps nothing") {
    val n = docs.count()
    val all = Mixture.sample(docs, "doc_id", "source",
      Map.empty, defaultThreshold = Mixture.Unit)
    val none = Mixture.sample(docs, "doc_id", "source", Map.empty)
    assert(all.count() == n && none.count() == 0)
  }

  test("kept sets nest: half-rate sample is a subset of full-rate") {
    def ids(t: Long) = Mixture.sample(docs, "doc_id", "source",
        Map.empty, defaultThreshold = t)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val lo = ids(300000)
    val hi = ids(600000)
    assert(lo.subsetOf(hi))
    // and the achieved rates bracket the targets loosely (500 docs)
    val n = docs.count().toDouble
    assert(lo.size / n > 0.15 && lo.size / n < 0.45)
    assert(hi.size / n > 0.45 && hi.size / n < 0.75)
  }

  test("per-source thresholds apply and unlisted sources drop") {
    val out = Mixture.sample(docs, "doc_id", "source",
      Map("src0" -> Mixture.Unit, "src1" -> 0L))
    val by = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(by.keySet == Set("src0"))
    assert(by("src0") == docs.filter(col("source") === "src0").count())
  }

  test("deterministic under repartitioning") {
    def ids(d: org.apache.spark.sql.DataFrame) =
      Mixture.sample(d, "doc_id", "source", Map.empty, 400000)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids(docs) == ids(docs.repartition(17)))
  }

  test("upsample: copy counts are floor(w)+gate, reps dense from 0") {
    val n = docs.count()
    // integer weights replicate exactly, no fractional gate involved
    val twoX = Mixture.upsample(docs, "doc_id", lit(2L * Mixture.Unit))
    assert(twoX.count() == 2 * n)
    assert(twoX.groupBy(col("doc_id")).count()
      .filter(col("count") =!= 2).count() == 0)
    // 2.5x: every doc has 2 or 3 copies, total strictly between
    val halfUp = Mixture.upsample(docs, "doc_id",
      lit(2L * Mixture.Unit + Mixture.Unit / 2))
    val perDoc = halfUp.groupBy(col("doc_id")).count()
    assert(perDoc.filter(col("count") < 2 || col("count") > 3).count() == 0)
    val total = halfUp.count()
    assert(total > 2 * n && total < 3 * n)
    // rep indices are dense 0..k-1 per doc
    val maxRep = halfUp.groupBy(col("doc_id"))
      .agg(max(col("rep")).as("mx"), count(lit(1)).as("k"))
    assert(maxRep.filter(col("mx") =!= col("k") - 1).count() == 0)
    // weight < 1 epoch: pure-fractional path, a strict nonempty subset
    val frac = Mixture.upsample(docs, "doc_id", lit(Mixture.Unit / 2))
    val fn = frac.count()
    assert(fn > 0 && fn < n)
    assert(frac.groupBy(col("doc_id")).count()
      .filter(col("count") =!= 1).count() == 0)
    // deterministic under repartitioning
    def rows(d: org.apache.spark.sql.DataFrame) =
      Mixture.upsample(d, "doc_id", lit(1300000L))
        .select(col("doc_id"), col("rep"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows(docs) == rows(docs.repartition(13)))
  }

  test("sampleByBucket: per-band rates, unlisted buckets drop, " +
      "gate matches the per-id keepExpr") {
    val bucketed = docs.select(col("doc_id"))
      .withColumn("bucket", col("doc_id") % 4)  // bucket 3 unlisted
    val kept = Mixture.sampleByBucket(bucketed, "doc_id", "bucket",
        Seq(Mixture.Unit, Mixture.Unit / 2, 0L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // bucket 0 keeps everything; buckets 2 (zero weight) and 3
    // (unlisted) keep nothing
    val n0 = bucketed.filter(col("bucket") === 0).count()
    assert(kept.count(_._2 == 0L) == n0)
    assert(!kept.exists(r => r._2 == 2L || r._2 == 3L))
    // bucket 1 survivors are exactly the keepExpr set at 500000
    val b1 = bucketed.filter(col("bucket") === 1)
    val expect1 = b1.filter(Mixture.keepExpr(col("doc_id"),
        lit(Mixture.Unit / 2))).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept.filter(_._2 == 1L).map(_._1).toSet == expect1)
    assert(expect1.nonEmpty && expect1.size < b1.count())
    // survivors carry the band's threshold
    assert(kept.forall(r => r._3 ==
      (if (r._2 == 0L) Mixture.Unit else Mixture.Unit / 2)))
  }
}
