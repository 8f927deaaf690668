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
}
