package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental audio index: batched ingest reproduces the one-shot
  * pair set under any batching, and delete removes clips from the
  * stored state.
  */
class IncrementalAudioSpec extends SparkSpec {

  /** Fingerprints with planted near-dups: clips 1..20 plus exact
    * fingerprint copies of every %3 (id+100).
    */
  private def fps: DataFrame = {
    import spark.implicits._
    val base = (1 to 20).map { k =>
      val a = Wav.Audio(8000, 1, Array.tabulate(400 + k)(i =>
        ((((k + 1) * 2654435761L * (i + 3) + i.toLong * (i + 7))
          % 16384L) - 8192L).toShort))
      (k.toLong, AudioFp.fingerprint(a))
    }
    val dups = base.filter(_._1 % 3 == 0).map { case (id, f) => (id + 100, f) }
    (base ++ dups).toDF("id", "afp")
  }

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("batched ingest == one-shot pairs, under two different batchings") {
    val f = fps.localCheckpoint()
    val oneShot = pairSet(
      Perceptual.hammingPairs(f, "id", "afp", maxHamming = 3, bands = 4,
        hashBits = AudioFp.HashBits))
    for (m <- Seq(2, 3)) {
      val slices = (0 until m).map(r => f.filter(col("id") % m === r))
      val (idx0, p0) = IncrementalAudio.build(slices.head)
      val (pairs, _) = slices.tail.foldLeft((pairSet(p0), idx0)) {
        case ((acc, idx), b) =>
          val (next, np) = IncrementalAudio.addBatch(idx, b)
          (acc ++ pairSet(np), next)
      }
      assert(pairs === oneShot, s"batching % $m")
    }
  }

  test("pairs are exactly-once across batches") {
    val f = fps.localCheckpoint()
    val (idx0, p0) = IncrementalAudio.build(f.filter(col("id") <= 10))
    val (_, p1) = IncrementalAudio.addBatch(idx0, f.filter(col("id") > 10))
    assert(pairSet(p0).intersect(pairSet(p1)).isEmpty)
  }

  test("delete removes clips from stored state") {
    import spark.implicits._
    val f = fps.localCheckpoint()
    val (idx, _) = IncrementalAudio.build(f)
    val after = IncrementalAudio.delete(idx,
      Seq(3L, 103L).toDF("id"), "id")
    assert(after.hashes.count() === f.count() - 2)
    // a re-added copy of a deleted clip pairs only against survivors
    val (_, np) = IncrementalAudio.addBatch(after,
      f.filter(col("id") === 3).select(lit(999L).as("id"), col("afp")))
    assert(pairSet(np).forall { case (a, b) => a != 3L && b != 103L })
  }

  test("save/load round-trips through the catalog; loaded index ingests") {
    val cat = new graft.catalog.ParquetCatalog(spark,
      java.nio.file.Files.createTempDirectory("graft-audio-idx").toString)
    val f = fps.localCheckpoint()
    val (idx, _) = IncrementalAudio.build(f.filter(col("id") <= 10))
    IncrementalAudio.save(idx, cat, "aidx")
    val back = IncrementalAudio.load(cat, "aidx")
    assert(back.hashes.collect().toSet === idx.hashes.collect().toSet)
    val (_, npA) = IncrementalAudio.addBatch(idx, f.filter(col("id") > 10))
    val (_, npB) = IncrementalAudio.addBatch(back, f.filter(col("id") > 10))
    assert(pairSet(npA) === pairSet(npB))
  }

  test("clusters output matches Perceptual.clusters on the same state") {
    val f = fps.localCheckpoint()
    val (idx, p) = IncrementalAudio.build(f)
    val inc = IncrementalAudio.clusters(idx, p)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3))).toSet
    val one = Perceptual.clusters(f, "id", "afp", maxHamming = 3, bands = 4,
        hashBits = AudioFp.HashBits)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3))).toSet
    assert(inc === one)
  }
}
