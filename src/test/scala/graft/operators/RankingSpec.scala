package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Two-phase global row-number: must equal the single-window global
  * rank exactly, independent of input layout, while planning range
  * slices instead of a corpus-wide single-partition sort.
  */
class RankingSpec extends SparkSpec {

  private def docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    .select(col("doc_id"),
      graft.functions.PortableHash.hash60Base(col("doc_id").cast("string"))
        .as("k"))

  test("equals the single-window global row_number") {
    val got = Ranking.globalRowNumber(docs, Seq("k", "doc_id"),
        "ord")
      .select(col("doc_id"), col("ord"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = docs
      .withColumn("ord", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("k"), col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("ord"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
  }

  test("layout-independent") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Ranking.globalRowNumber(df, Seq("k", "doc_id"), "ord")
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(run(docs) == run(docs.repartition(13)))
  }

  test("slicing phase is range-sliced, not a single-partition sort") {
    val plan = TwoPhase
      .slicedWithin(docs, Nil, Seq("k", "doc_id"), lit(1L))
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"),
      s"expected a range exchange in:\n$plan")
    assert(plan.contains("__tp_cell"),
      s"expected cell-sliced window in:\n$plan")
    // pinned partition count: AQE never rewrites the range shuffle
    assert(plan.contains("REPARTITION_BY_NUM"), plan)
  }

  test("both phases consume ONE materialized slicing (the sliced " +
      "relation is checkpointed; readers scan frozen blocks)") {
    val out = Ranking.globalRowNumber(docs, Seq("k", "doc_id"), "ord")
    val fin = out.queryExecution.executedPlan.toString
    // both the per-row leg and the subtotal leg read the checkpoint
    // scan — the range exchange ran exactly once, before it, so
    // divergent re-sampling (rdd.id-seeded skew re-sample on a
    // duplicated exchange, the q112-at-sf0.1 failure) cannot occur
    assert(fin.contains("ExistingRDD") || fin.contains("Scan ExistingRDD"),
      s"expected the materialized slicing scan in:\n$fin")
    assert(!fin.contains("rangepartitioning"),
      s"range exchange must be behind the checkpoint, not re-planned:\n$fin")
    out.collect()
  }

  test("ranks are a permutation of 1..N") {
    val n = docs.count()
    val ords = Ranking.globalRowNumber(docs, Seq("k", "doc_id"),
        "ord")
      .select("ord").collect().map(_.getLong(0)).sorted
    assert(ords.toSeq == (1L to n).toSeq)
  }
}
