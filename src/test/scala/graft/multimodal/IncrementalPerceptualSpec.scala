package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental perceptual image index: batched ingest reproduces the
  * one-shot pair set under any batching (including the band-limited
  * maxHamming=6 regime), and delete removes images from the stored
  * state.
  */
class IncrementalPerceptualSpec extends SparkSpec {

  /** dHashes with planted near-dups: images 1..20 plus re-encoded
    * copies of every %3 (id+100) — identical pixels, so identical
    * dHash.
    */
  private def fps: DataFrame = {
    import spark.implicits._
    val base = (1 to 20).map { k =>
      val w = 8 + k % 9; val h = 8 + (k * 3) % 9
      val rgb = Array.tabulate(w * h * 3)(i =>
        ((k * 2654435761L + i.toLong * (i + 7)) % 256).toByte)
      (k.toLong, Perceptual.dHash(Bmp.decode(Bmp.encode(
        Bmp.Image(w, h, rgb)))))
    }
    val dups = base.filter(_._1 % 3 == 0).map { case (id, f) => (id + 100, f) }
    (base ++ dups).toDF("id", "dhash")
  }

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("batched ingest == one-shot pairs, under two different batchings") {
    val f = fps.localCheckpoint()
    val oneShot = pairSet(
      Perceptual.hammingPairs(f, "id", "dhash", maxHamming = 6))
    for (m <- Seq(2, 3)) {
      val slices = (0 until m).map(r => f.filter(col("id") % m === r))
      val (idx0, p0) = IncrementalPerceptual.build(slices.head)
      val (pairs, _) = slices.tail.foldLeft((pairSet(p0), idx0)) {
        case ((acc, idx), b) =>
          val (next, np) = IncrementalPerceptual.addBatch(idx, b)
          (acc ++ pairSet(np), next)
      }
      assert(pairs === oneShot, s"batching % $m")
    }
  }

  test("pairs are exactly-once across batches") {
    val f = fps.localCheckpoint()
    val (idx0, p0) = IncrementalPerceptual.build(f.filter(col("id") <= 10))
    val (_, p1) = IncrementalPerceptual.addBatch(idx0,
      f.filter(col("id") > 10))
    assert(pairSet(p0).intersect(pairSet(p1)).isEmpty)
  }

  test("delete removes images from stored state") {
    import spark.implicits._
    val f = fps.localCheckpoint()
    val (idx, _) = IncrementalPerceptual.build(f)
    val after = IncrementalPerceptual.delete(idx,
      Seq(3L, 103L).toDF("id"), "id")
    assert(after.hashes.count() === f.count() - 2)
    // a re-added copy of a deleted image pairs only against survivors
    val (_, np) = IncrementalPerceptual.addBatch(after,
      f.filter(col("id") === 3).select(lit(999L).as("id"), col("dhash")))
    assert(pairSet(np).forall { case (a, b) => a != 3L && b != 103L })
  }

  test("save/load round-trips through the catalog; loaded index ingests") {
    val cat = new graft.catalog.ParquetCatalog(spark,
      java.nio.file.Files.createTempDirectory("graft-img-idx").toString)
    val f = fps.localCheckpoint()
    val (idx, _) = IncrementalPerceptual.build(f.filter(col("id") <= 10))
    IncrementalPerceptual.save(idx, cat, "iidx")
    val back = IncrementalPerceptual.load(cat, "iidx")
    assert(back.hashes.collect().toSet === idx.hashes.collect().toSet)
    val (_, npA) = IncrementalPerceptual.addBatch(idx,
      f.filter(col("id") > 10))
    val (_, npB) = IncrementalPerceptual.addBatch(back,
      f.filter(col("id") > 10))
    assert(pairSet(npA) === pairSet(npB))
  }

  test("clusters output matches Perceptual.clusters on the same state") {
    val f = fps.localCheckpoint()
    val (idx, p) = IncrementalPerceptual.build(f)
    val inc = IncrementalPerceptual.clusters(idx, p)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3))).toSet
    val one = Perceptual.clusters(f, "id", "dhash", maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3))).toSet
    assert(inc === one)
  }
}
