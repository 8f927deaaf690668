package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Perceptual dedup contract: dHash is invariant under re-encoding and
  * integer upscaling, the banded pair stage honors the pigeonhole
  * guarantee (hamming<=3 always caught) and never generates all-pairs,
  * and cluster labels pick the min id.
  */
class PerceptualSpec extends SparkSpec {
  import spark.implicits._

  private def img(id: Long, w: Int, h: Int, off: Int = 0): Bmp.Image =
    Bmp.Image(w, h, Array.tabulate(w * h * 3)(i =>
      ((id * 2654435761L + i.toLong * (i + 7) + off) % 256).toByte))

  test("dHash survives encode/decode round trips and integer upscales") {
    val base = img(7L, 13, 9)
    val viaFile = Bmp.decode(Bmp.encode(base))
    assert(Perceptual.dHash(base) == Perceptual.dHash(viaFile))
    // nearest-neighbor kx upscale: floor((x*kw/8)/k) == floor(x*w/8),
    // so the 8x8 sample grid hits the same source pixels
    for (k <- Seq(2, 3, 5)) {
      val up = Bmp.resample(base, base.width * k, base.height * k)
      assert(Perceptual.dHash(up) == Perceptual.dHash(base),
        s"dHash changed under ${k}x upscale")
    }
  }

  test("banded pairs: hamming<=3 guaranteed, far pairs only via shared " +
      "bands, candidates bucketed not all-pairs") {
    // base hash, a 1-bit flip, a 3-bit flip (spread over 3 bands), and
    // a hash differing in all 4 bands (no shared band -> no candidate
    // even though we'd verify it at a loose threshold)
    val h0 = 0x00FABCDE012345L
    val h1 = h0 ^ (1L << 3)
    val h3 = h0 ^ (1L << 2) ^ (1L << 17) ^ (1L << 31)
    val hFar = h0 ^ 0x1L ^ (1L << 14) ^ (1L << 28) ^ (1L << 42)
    val df = Seq((1L, h0), (2L, h1), (3L, h3), (4L, hFar))
      .toDF("id", "dhash")
    val got = Perceptual.hammingPairs(df, "id", "dhash", maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 2L)) && got.contains((1L, 3L)))
    // hFar is within hamming 4 of h0 but shares NO band: band-limited
    // semantics exclude it (the oracle replays exactly this)
    assert(!got.contains((1L, 4L)))
    // h1 vs h3: hamming 4, bands 0+2 differ... band 1,3 shared -> caught
    assert(got.contains((2L, 3L)))
  }

  test("crossMatches: cross-corpus only, never within; equals the " +
      "cross-restricted hammingPairs; re-encoded plants found") {
    // train: two originals near each other (hamming 1 — must NOT pair,
    // they are both train); eval: a re-encode of train id 1 (identical
    // pixels -> hamming 0), plus an unrelated far hash
    val t1 = Perceptual.dHash(img(1L, 12, 10))
    val t2 = t1 ^ (1L << 5)
    val e1 = Perceptual.dHash(Bmp.decode(Bmp.encode(img(1L, 12, 10))))
    val eFar = t1 ^ 0x1L ^ (1L << 14) ^ (1L << 28) ^ (1L << 42)
    val train = Seq((1L, t1), (2L, t2)).toDF("id", "dhash")
    val eval = Seq((101L, e1), (102L, eFar)).toDF("id", "dhash")
    val got = Perceptual.crossMatches(train, eval, "id", "dhash",
        maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // plant found at hamming 0; t2 is hamming 1 from the plant too
    assert(got.contains((1L, 101L, 0)))
    assert(got.contains((2L, 101L, 1)))
    // within-train pair (1,2) absent; eFar shares no band with anything
    assert(got.forall { case (a, b, _) => a < 100 && b >= 100 })
    assert(!got.exists(_._2 == 102L))
    // contract: crossMatches == hammingPairs over the union, restricted
    // to cross pairs (ids disjoint so a<b orients train->eval)
    val viaPairs = Perceptual.hammingPairs(train.unionByName(eval), "id",
        "dhash", maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => a < 100 && b >= 100 }.toSet
    assert(got.map { case (a, b, _) => (a, b) } == viaPairs)
  }

  test("clusters: min-id labels, singletons not duplicates") {
    val df = Seq(
      (10L, 0x0AAAL), (11L, 0x0AABL), // pair (hamming 1)
      (20L, 0x7000_0000_0000L)        // singleton
    ).toDF("id", "dhash")
    val out = Perceptual.clusters(df, "id", "dhash", maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3))).toSet
    assert(out == Set((10L, 10L, false), (11L, 10L, true),
      (20L, 20L, false)))
  }
}
