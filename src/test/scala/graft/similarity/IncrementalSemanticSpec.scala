package graft.similarity

import graft.SparkSpec
import graft.catalog.ParquetCatalog
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental embedding-dedup ingest: batched union must equal the
  * one-shot pass against the same stored centroids (2- and 3-batch
  * splits), the index must round-trip through the catalog, and deletes
  * must stop deleted ids from pairing.
  */
class IncrementalSemanticSpec extends SparkSpec {

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

  private val Th = 0.99

  private def batch(b: Int, of: Int): DataFrame =
    corpus.filter(col("vec_id") % of === b)

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("2-batch and 3-batch unions equal the one-shot pass on stored " +
      "centroids") {
    // one-shot: train on batch(0,3), then everything else in ONE batch
    val (i0, p0) = IncrementalSemantic.build(batch(0, 3), "vec_id",
      "embedding", Th, c = 4, iters = 1)
    val rest = corpus.filter(col("vec_id") % 3 =!= 0)
    val (_, pRest) = IncrementalSemantic.addBatch(i0, rest, "vec_id",
      "embedding", Th)
    val oneShot = pairSet(p0) ++ pairSet(pRest)

    // three batches, same training prefix
    val (j1, q1) = IncrementalSemantic.addBatch(i0, batch(1, 3), "vec_id",
      "embedding", Th)
    val (j2, q2) = IncrementalSemantic.addBatch(j1, batch(2, 3), "vec_id",
      "embedding", Th)
    val threeWay = pairSet(p0) ++ pairSet(q1) ++ pairSet(q2)
    assert(threeWay == oneShot)
    assert(threeWay.nonEmpty, "planted duplicates must produce pairs")
    // per-batch outputs are disjoint (exactly-once emission)
    assert(pairSet(p0).intersect(pairSet(q1)).isEmpty &&
      (pairSet(p0) ++ pairSet(q1)).intersect(pairSet(q2)).isEmpty)
    // index contents equal regardless of batching
    assert(j2.members.count() == corpus.count())
  }

  test("index round-trips through the catalog between batches") {
    val cat = new ParquetCatalog(spark,
      java.nio.file.Files.createTempDirectory("graft-isem").toString)
    val (i0, _) = IncrementalSemantic.build(batch(0, 2), "vec_id",
      "embedding", Th, c = 4, iters = 1)
    IncrementalSemantic.save(i0, cat, "semidx")(spark)
    val loaded = IncrementalSemantic.load(cat, "semidx")
    assert(loaded.centroids.map(_.toSeq).toSeq ==
      i0.centroids.map(_.toSeq).toSeq)
    val (_, pMem) = IncrementalSemantic.addBatch(i0, batch(1, 2),
      "vec_id", "embedding", Th)
    val (_, pDisk) = IncrementalSemantic.addBatch(loaded, batch(1, 2),
      "vec_id", "embedding", Th)
    assert(pairSet(pMem) == pairSet(pDisk) && pairSet(pMem).nonEmpty)
    // repeated saves keep one on-disk version (vacuumed history)
    IncrementalSemantic.save(i0, cat, "semidx")(spark)
    IncrementalSemantic.save(i0, cat, "semidx")(spark)
    assert(IncrementalSemantic.load(cat, "semidx").members.count() ==
      i0.members.count())
  }

  test("deleted ids stop pairing; unknown deletes are a no-op") {
    val (i0, _) = IncrementalSemantic.build(batch(0, 2), "vec_id",
      "embedding", Th, c = 4, iters = 1)
    // delete every base id that has a planted copy in batch 1
    import spark.implicits._
    val victims = batch(0, 2).filter(col("vec_id") % 7 === 0)
      .select(col("vec_id"))
    val nVictims = victims.count()
    assert(nVictims > 0)
    val iDel = IncrementalSemantic.delete(i0, victims, "vec_id")
    assert(iDel.members.count() == i0.members.count() - nVictims)
    val deleted = victims.collect().map(_.getLong(0)).toSet
    val (_, pAfter) = IncrementalSemantic.addBatch(iDel, batch(1, 2),
      "vec_id", "embedding", Th)
    val touched = pairSet(pAfter).flatMap(p => Seq(p._1, p._2))
    assert(touched.intersect(deleted).isEmpty)
    // deleting ids never indexed changes nothing
    val iNoop = IncrementalSemantic.delete(iDel,
      Seq(999999999L).toDF("vec_id"), "vec_id")
    assert(iNoop.members.count() == iDel.members.count())
  }

  test("retrain equals a from-scratch build over the surviving corpus") {
    def memberSet(i: SemanticIndex): Set[(Long, Int)] = i.members
      .select(col("id"), col("bucket")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet

    // grow in two batches (centroids frozen at batch 0), then retrain
    val (i0, _) = IncrementalSemantic.build(batch(0, 2), "vec_id",
      "embedding", Th, c = 4, iters = 1)
    val (i1, _) = IncrementalSemantic.addBatch(i0, batch(1, 2), "vec_id",
      "embedding", Th)
    val r = IncrementalSemantic.retrain(i1, c = 8, iters = 2)
    val (scratch, _) = IncrementalSemantic.build(corpus, "vec_id",
      "embedding", Th, c = 8, iters = 2)
    assert(r.centroids.map(_.toSeq).toSeq ==
      scratch.centroids.map(_.toSeq).toSeq)
    assert(memberSet(r) == memberSet(scratch))
    // re-bucketing must actually use the new centroids: with c grown
    // 4 -> 8, some member lands in a bucket the frozen index lacked
    assert(r.members.select(col("bucket")).distinct().count() >
      i1.members.select(col("bucket")).distinct().count())

    // retrain after delete trains only on survivors
    val victims = batch(0, 2).filter(col("vec_id") % 7 === 0)
      .select(col("vec_id"))
    val rDel = IncrementalSemantic.retrain(
      IncrementalSemantic.delete(i1, victims, "vec_id"), c = 8, iters = 2)
    val (scratchDel, _) = IncrementalSemantic.build(
      corpus.join(victims, Seq("vec_id"), "left_anti"), "vec_id",
      "embedding", Th, c = 8, iters = 2)
    assert(rDel.centroids.map(_.toSeq).toSeq ==
      scratchDel.centroids.map(_.toSeq).toSeq)
    assert(memberSet(rDel) == memberSet(scratchDel))
  }
}
