package graft.similarity

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cluster-bucketed semantic dedup: planted exact and scaled copies are
  * caught (including transitive triples), originals survive, and the
  * result is layout-independent.
  */
class SemanticDedupSpec extends SparkSpec {

  private def emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    .select(col("vec_id"), col("embedding"))

  /** The q95 corpus: base + exact copies (%7) + 2x-scaled copies (%11). */
  private def corpus: DataFrame = {
    val repA = emb.filter(col("vec_id") % 7 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val repB = emb.filter(col("vec_id") % 11 === 0)
      .select((col("vec_id") + 2000000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
    emb.unionByName(repA).unionByName(repB)
  }

  private def run(df: DataFrame) =
    Similarity.semanticDedup(df, "vec_id", "embedding", threshold = 0.99,
        c = 4, iters = 1)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap

  test("exact and scaled copies collapse onto their base; bases survive") {
    val out = run(corpus)
    val baseIds = emb.select("vec_id").collect().map(_.getLong(0)).toSet
    for (k <- baseIds) {
      assert(out(k) == (k, true), s"base $k must survive as its own rep")
      if (k % 7 == 0)
        assert(out(k + 1000000L) == (k, false), s"exact copy of $k")
      if (k % 11 == 0)
        assert(out(k + 2000000L) == (k, false), s"scaled copy of $k")
    }
    // survivor count == base count: every replica deduped, nothing else
    assert(out.count(_._2._2) == baseIds.size)
  }

  test("transitive triple (base, exact, scaled) shares one cluster") {
    val out = run(corpus)
    // vec_id 0 is divisible by both 7 and 11 — a 3-clique through base 0
    assert(out(1000000L)._1 == 0L && out(2000000L)._1 == 0L)
  }

  test("dedup is layout-independent") {
    val a = run(corpus)
    val b = run(corpus.repartition(13))
    assert(a == b)
  }

  test("duplicate-free corpus keeps every vector") {
    val out = run(emb)
    assert(out.forall { case (id, (cluster, kept)) =>
      cluster == id && kept })
  }

  test("multi-probe catches the planted boundary pair single-probe misses") {
    // Two 200-point blobs on orthogonal axes plus a near-duplicate pair
    // (cosine ~0.9999) straddling the midpoint: Lloyd converges to the
    // blob centers, the pair's primary assignments split across the
    // boundary, so single-probe never compares them — the structural
    // miss of SemDeDup bucketing. nProbe=2 sends each vector into both
    // buckets for the pair stage and the duplicate collapses.
    import spark.implicits._
    val blobA = (0 until 200).map(i =>
      (i.toLong, Array(10f, 0.1f * (i % 5), 0f, 0f)))
    val blobB = (0 until 200).map(i =>
      (1000L + i, Array(0.1f * (i % 5), 10f, 0f, 0f)))
    val pair = Seq((1500L, Array(7.0f, 6.9f, 0f, 0f)),
      (1501L, Array(6.9f, 7.0f, 0f, 0f)))
    val corpus2 = (blobA ++ blobB ++ pair).toDF("vec_id", "embedding")
    def dedup(nProbe: Int): Map[Long, (Int, Long, Boolean)] =
      Similarity.semanticDedup(corpus2, "vec_id", "embedding",
          threshold = 0.99, c = 2, iters = 5, nProbe = nProbe)
        .collect()
        .map(r => r.getLong(0) ->
          (r.getInt(1), r.getLong(2), r.getBoolean(3))).toMap
    val single = dedup(1)
    assert(single(1500L)._1 != single(1501L)._1,
      "plant broken: pair must straddle the cluster boundary")
    assert(single(1500L)._3 && single(1501L)._3,
      "single-probe should miss the boundary pair (both kept)")
    val multi = dedup(2)
    // primary buckets unchanged; the pair now shares a component
    assert(multi(1500L)._1 == single(1500L)._1 &&
      multi(1501L)._1 == single(1501L)._1)
    assert(multi(1501L)._2 == 1500L && !multi(1501L)._3 && multi(1500L)._3,
      "nProbe=2 must collapse the boundary duplicate onto its min id")
    // the hierarchical two-level scan composes with multi-probe: the
    // same boundary pair is caught through nearestHierN's probes
    val hierMulti = Similarity.semanticDedup(corpus2, "vec_id",
        "embedding", threshold = 0.99, c = 2, iters = 5,
        hierarchical = true, nProbe = 2)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(hierMulti(1501L) == ((1500L, false)) &&
      hierMulti(1500L)._2,
      "hierarchical + nProbe=2 must also collapse the boundary pair")
  }

  test("hierarchical multi-probe equals exact multi-probe on the q95 corpus") {
    def go(hier: Boolean) =
      Similarity.semanticDedup(corpus, "vec_id", "embedding",
          threshold = 0.99, c = 4, iters = 1, hierarchical = hier,
          nProbe = 2)
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(go(true) == go(false))
  }

  test("multi-probe output is a refinement: every single-probe dup survives") {
    val single = run(corpus)
    val multi = Similarity.semanticDedup(corpus, "vec_id", "embedding",
        threshold = 0.99, c = 4, iters = 1, nProbe = 2)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    // multi-probe can only ADD pairs: anything deduped single-probe
    // stays deduped (labels may shrink as components merge)
    for ((id, (_, kept)) <- single if !kept)
      assert(!multi(id)._2, s"$id was deduped single-probe but kept multi")
  }

  test("hierarchical assignment yields the identical dedup output") {
    // buckets may differ near super-boundaries; the DEDUP result
    // (cluster labels + survivors) must not — duplicates share a
    // quantized view, so they co-assign under either rule
    val exact = run(corpus)
    val hier = Similarity.semanticDedup(corpus, "vec_id", "embedding",
        threshold = 0.99, c = 4, iters = 1, hierarchical = true)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(hier == exact)
  }
}
