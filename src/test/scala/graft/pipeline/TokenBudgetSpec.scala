package graft.pipeline

import graft.SparkSpec
import graft.sources.Tables
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

/** Token-budget waterfill: the allocation is a funded prefix + one
  * marginal source + a dropped tail, the budget line is exact integer
  * arithmetic, and sampling respects the per-source rates.
  */
class TokenBudgetSpec extends SparkSpec {

  private def docs = Tables(spark, "/root/testdata/sf0.001", "documents")
  private def toks = TextAnalysis.tokenCount(col("text"))
  private def priority = substring(col("source"), 4, 10).cast("int")

  private def alloc = TokenBudget.allocate(docs, "source", priority, toks,
    budgetNum = 2L, budgetDen = 5L)

  test("allocation is funded prefix, <=1 marginal source, dropped tail") {
    val rows = alloc.orderBy(col("priority")).collect()
    val ppm = rows.map(_.getAs[Long]("keep_ppm"))
    val full = ppm.takeWhile(_ == Mixture.Unit)
    val rest = ppm.drop(full.length)
    val marginal = rest.takeWhile(p => p > 0 && p < Mixture.Unit)
    assert(marginal.length <= 1, "at most one partially-funded source")
    assert(rest.drop(marginal.length).forall(_ == 0L), "tail drops to 0")

    val budget = rows.map(_.getAs[Long]("budget")).distinct
    val total = rows.map(_.getAs[Long]("tok_in")).sum
    assert(budget.toSeq == Seq(total * 2 / 5), "budget = total * 2/5")

    // cumulative sums are consistent and the funded prefix fits exactly
    rows.foreach { r =>
      if (r.getAs[Long]("keep_ppm") == Mixture.Unit)
        assert(r.getAs[Long]("cum_before") + r.getAs[Long]("tok_in")
          <= r.getAs[Long]("budget"))
      if (r.getAs[Long]("keep_ppm") == 0L)
        assert(r.getAs[Long]("cum_before") >= r.getAs[Long]("budget"))
    }
  }

  test("sampling keeps all of funded sources, none of dropped ones") {
    val a = alloc
    val kept = TokenBudget.sample(docs, "doc_id", "source", a)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    a.collect().foreach { r =>
      val src = r.getString(0)
      val ppm = r.getAs[Long]("keep_ppm")
      if (ppm == Mixture.Unit)
        assert(kept.getOrElse(src, 0L) == r.getAs[Long]("n_in"))
      if (ppm == 0L) assert(!kept.contains(src))
      if (ppm > 0 && ppm < Mixture.Unit)
        assert(kept.getOrElse(src, 0L) <= r.getAs[Long]("n_in"))
    }
  }

  test("allocation and sample are layout-independent") {
    val a = alloc.orderBy("priority").collect().toSeq
    val b = TokenBudget.allocate(docs.repartition(13), "source", priority,
      toks, 2L, 5L).orderBy("priority").collect().toSeq
    assert(a == b)
    val ka = TokenBudget.sample(docs, "doc_id", "source", alloc)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val kb = TokenBudget.sample(docs.repartition(7), "doc_id", "source",
      alloc).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ka == kb)
  }

  test("budget 1/1 keeps everything; budget 0/1 keeps nothing") {
    val all = TokenBudget.allocate(docs, "source", priority, toks, 1L, 1L)
    assert(all.collect().forall(_.getAs[Long]("keep_ppm") == Mixture.Unit))
    val none = TokenBudget.allocate(docs, "source", priority, toks, 0L, 1L)
    assert(none.collect().forall(_.getAs[Long]("keep_ppm") == 0L))
    assert(TokenBudget.sample(docs, "doc_id", "source", none).count() == 0)
  }
}
