package graft.pipeline

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** End-to-end corpus cleaning on a planted-duplicate corpus. */
class CorpusPipelineSpec extends SparkSpec {

  private def planted = {
    val d = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    d.unionByName(d.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
      .unionByName(d.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 2000000).as("doc_id"),
          concat(col("text"), lit(" zz tail marker")).as("text")))
  }

  test("gates hold, exact copies collapse to the smallest id, near-dups drop") {
    val out = CorpusPipeline.clean(planted, "doc_id", "text").cache()

    // every survivor passed both gates
    assert(out.filter(col("quality") < 0.7 ||
      col("lang_pred") =!= "en").count() === 0)

    // no planted exact copy (id+1e6) survives when its original did
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val exactCopies = ids.filter(_ >= 1000000).filter(_ < 2000000)
    assert(exactCopies.forall(c => !ids.contains(c - 1000000)),
      "an exact copy survived alongside its original")

    // near-dup tails (id+2e6): the pair can keep at most one member
    val tails = ids.filter(_ >= 2000000)
    assert(tails.forall(c => !ids.contains(c - 2000000)),
      "a near-duplicate tail survived alongside its original")

    // cleaning is idempotent: a second pass removes nothing
    val again = CorpusPipeline.clean(
      out.select(col("doc_id"), col("text")), "doc_id", "text")
    assert(again.count() === out.count())
  }

  test("keepBest: one survivor per cluster, with the cluster's best quality") {
    val c = planted
    val minId = CorpusPipeline.clean(c, "doc_id", "text")
    val best = CorpusPipeline.clean(c, "doc_id", "text",
      CorpusPipeline.Config(keepBest = true))
    // same number of survivors (one per cluster, whatever the policy)
    assert(best.count() == minId.count())
    // every keep-best survivor has quality >= every member of the
    // cluster it represents
    val exact = minId.select(col("doc_id")).unionByName(
        best.select(col("doc_id"))).distinct() // superset of survivors
    val bestRows = best.select(col("doc_id"), col("quality"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val minRows = minId.select(col("doc_id"), col("quality"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // for clusters where the policies disagree, keep-best's pick must
    // strictly beat (or tie by a lower id against) min-id's pick
    val onlyBest = bestRows.keySet -- minRows.keySet
    val onlyMin = minRows.keySet -- bestRows.keySet
    assert(onlyBest.size == onlyMin.size)
    if (onlyBest.nonEmpty) {
      val bq = onlyBest.toSeq.map(bestRows).max
      val mq = onlyMin.toSeq.map(minRows).max
      assert(bq >= mq, s"keep-best pick $bq should not lose to min-id $mq")
    }
  }

  test("routeByLanguage PARTITIONS the survivor set: per-language " +
      "sub-corpora are disjoint and union to clean()'s output; every " +
      "label is in the gate's keep set") {
    import graft.text.LangClassifier
    val base = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val cip = translate(col("text"),
      "abcdefghijklmnopqrstuvwxy", "yxwvutsrqponmlkjihgfedcba")
    val mixed = base.select(col("doc_id"),
      when(col("doc_id") % 2 === 0, col("text")).otherwise(cip)
        .as("text"))
    val seeds = mixed.filter(col("doc_id") % 10 < 2)
      .select(col("doc_id"),
        when(col("doc_id") % 2 === 0, lit("en")).otherwise(lit("xx"))
          .as("label"), col("text"))
    val model = LangClassifier.fit(seeds, "doc_id", "label", "text")
    val cfg = CorpusPipeline.Config(langGate =
      Some(CorpusPipeline.LangGate(model, Seq("en", "xx"))))
    val routed = CorpusPipeline.routeByLanguage(mixed, "doc_id",
      "text", cfg).cache()
    val survivors = CorpusPipeline.clean(mixed, "doc_id", "text", cfg)
    val sIds = survivors.select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val byLang = routed.select(col("doc_id"), col("lang_routed"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    // union == survivors and each id appears exactly once (disjoint)
    assert(byLang.map(_._1).toSet == sIds)
    assert(byLang.length == sIds.size)
    assert(byLang.map(_._2).toSet.subsetOf(Set("en", "xx")))
    // both sub-corpora are non-empty on the mixed fixture
    assert(byLang.count(_._2 == "en") > 0)
    assert(byLang.count(_._2 == "xx") > 0)
    // a keep-one gate routes everything to that one label
    val onlyEn = CorpusPipeline.routeByLanguage(mixed, "doc_id", "text",
      CorpusPipeline.Config(langGate =
        Some(CorpusPipeline.LangGate(model, Seq("xx")))))
    assert(onlyEn.select("lang_routed").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("xx"))
    routed.unpersist()
  }

  test("release: clean survivors minus eval hits, leakage-safe split") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    // eval = a slice of the corpus itself (near-dup contamination by
    // construction) plus fresh docs that must match nothing
    val ev = docs.filter(col("doc_id") % 13 === 0)
      .select((col("doc_id") + 5000000L).as("doc_id"), col("text"))
      .unionByName(docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 7000000L).as("doc_id"),
          concat(lit("fresh eval doc "), col("doc_id"))
            .as("text")))
    val rel = CorpusPipeline.release(planted, ev, "doc_id", "text")
      .cache()
    val relIds = rel.select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet
    assert(relIds.nonEmpty)

    // released == clean survivors minus cross-corpus near-dup hits
    val cleanIds = CorpusPipeline.clean(planted, "doc_id", "text")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(relIds.subsetOf(cleanIds))
    val contaminated = graft.dedup.Dedup.crossCorpusMatches(
        planted, "doc_id", "text", ev, "doc_id", "text")
      .select(col("a")).collect().map(_.getLong(0)).toSet
    assert(relIds == cleanIds -- contaminated)
    assert((cleanIds -- relIds).nonEmpty,
      "the planted eval slice must actually remove someone")

    // no released pair above the LOOSE threshold straddles splits
    val splitOf = rel.select(col("doc_id"), col("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val loosePairs = graft.dedup.Dedup.minhashNearDuplicates(
        planted, "doc_id", "text", threshold = 0.3)
      .select(col("a"), col("b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => relIds.contains(a) && relIds.contains(b) }
    loosePairs.foreach { case (a, b) =>
      assert(splitOf(a) == splitOf(b),
        s"loose pair ($a,$b) straddles ${splitOf(a)}/${splitOf(b)}")
    }
    rel.unpersist(blocking = false)
  }

  test("funnel report: per-source counts are monotone and consistent " +
      "with clean") {
    val d = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("source"), col("text"))
    val corpus = d.unionByName(d.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"), col("source"),
          col("text")))
      .unionByName(d.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 2000000).as("doc_id"), col("source"),
          concat(col("text"), lit(" zz tail marker")).as("text")))
    val rep = CorpusPipeline.funnelReport(corpus, "doc_id", "source",
        "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rep.nonEmpty)
    rep.foreach { case (src, nIn, nGated, nExact, nFinal) =>
      assert(nIn >= nGated && nGated >= nExact && nExact >= nFinal,
        s"non-monotone funnel for $src")
    }
    assert(rep.map(_._2).sum == corpus.count())
    val cleaned = CorpusPipeline.clean(
      corpus.select(col("doc_id"), col("text")), "doc_id", "text")
    assert(rep.map(_._5).sum == cleaned.count())
  }

  test("familiarity gate drops unfamiliar docs that pass every " +
      "heuristic gate; threshold is the exact integer mean") {
    import spark.implicits._
    // reference: common-word docs; plant: quality-gate-passing docs of
    // words the reference never saw (every backoff branch dead -> 0)
    val ref = (1L to 6L).map(i =>
      i -> "the table is a fast join of the query and a scan is here")
      .toDF("doc_id", "text")
    val corpus = ref.unionByName(Seq(
      100L -> "the zq1 zq2 zq3 zq4 zq5 zq6 zq7 zq8 zq9 zq10 zq11 zq12",
      101L -> "the table is a fast join of the query and a scan is here")
      .toDF("doc_id", "text"))
    val counts = graft.text.Repetition.fitBackoffMaterialized(
      ref, "doc_id", "text")
    val cfg = CorpusPipeline.Config(familiarity = Some(
      CorpusPipeline.FamiliarityGate(counts, minScorePpm = 40000L)))
    val banded = CorpusPipeline.bandStages(
        CorpusPipeline.rowGates(corpus, "doc_id", "text", cfg),
        "doc_id", "text", cfg)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!banded.contains(100L), "unfamiliar doc must be gated")
    assert(banded.contains(101L), "in-distribution doc must survive")
    // the verdict equals the explicit integer-mean filter
    val scored = graft.text.Repetition.backoffScoreWith(counts,
        corpus, "doc_id", "text")
      .filter(col("score_sum") >= col("n_ctx") * 40000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val gatedIn = CorpusPipeline.rowGates(corpus, "doc_id", "text", cfg)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(banded == (scored intersect gatedIn))
  }
}
