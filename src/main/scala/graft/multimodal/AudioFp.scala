package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Spectral-energy audio fingerprint: the audio sibling of
  * [[Perceptual]]'s dHash — acoustically-identical clips that byte
  * dedup can never catch (re-encoded containers, nearest-neighbor
  * resampled copies, gain-scaled copies) collide; distinct clips don't.
  *
  * The clip is sampled at 128 fixed probe points evenly spaced in TIME
  * (channel 0) — sampling a fixed grid is what makes the signature
  * resample-invariant, exactly as dHash's 8×8 pixel grid is
  * resize-invariant: the probe index maps compose as
  * `floor(floor(j·m/P)·n/m) = floor(j·n/P)` for integer upsampling, so
  * probes of a resampled copy are the original's probes. The probes
  * split into 8 time windows × 16, and per window the energies of the
  * lag-{1,2,4} difference signals (a comb filterbank — small lags see
  * high-frequency content, large lags low) plus the raw energy form an
  * 8×4 "spectrogram". The fingerprint is its gradient bits along BOTH
  * axes: temporal (`S[w+1][band] > S[w][band]`, 7×4) and spectral
  * (`S[w][band+1] > S[w][band]`, 8×3 — the per-window frequency
  * shape), 52 bits total. Energy RATIOS are compared, never absolute
  * values, so an exact gain scaling (energies ×c²) flips no bit.
  *
  * Everything is int64 arithmetic on decoded samples, so the DuckDB
  * oracle replays the fingerprint from the generative sample formula
  * while the engine computes it from REAL WAV payloads ([[Wav.decode]]
  * in the same partition-wise pass — a codec boundary, the one
  * legitimate `mapPartitions` site). Pair generation reuses
  * [[Perceptual.hammingPairs]] at 4×13-bit bands: pigeonhole
  * guarantees every pair within hamming 3 shares a band — with
  * `maxHamming = 3` the banded candidate stage is exhaustive, never
  * all-pairs. Measured on the generative corpus: min inter-clip
  * hamming 5–6 over ~20k pairs, so threshold 3 has real margin.
  */
object AudioFp {

  val Probes = 128
  val Windows = 8
  val PerWindow: Int = Probes / Windows // 16
  val Lags: Seq[Int] = Seq(0, 1, 2, 4)  // 0 = raw energy band
  val HashBits: Int =
    (Windows - 1) * Lags.length + Windows * (Lags.length - 1) // 52

  final case class AudioMedia(doc_id: Long, payload: Array[Byte],
      n_bytes: Int)

  /** 52-bit spectral fingerprint of a decoded clip (probes channel 0):
    * 28 temporal-gradient bits + 24 spectral-gradient bits ([[HashBits]]). */
  def fingerprint(audio: Wav.Audio): Long = {
    val n = audio.frames
    require(n > 0, "empty clip")
    val ch = audio.channels
    val p = new Array[Long](Probes)
    var j = 0
    while (j < Probes) {
      p(j) = audio.samples((j.toLong * n / Probes).toInt * ch)
      j += 1
    }
    // S(w)(band): per-window lag-difference energies (band 0 = raw)
    val s = Array.ofDim[Long](Windows, Lags.length)
    var w = 0
    while (w < Windows) {
      var bi = 0
      while (bi < Lags.length) {
        val lag = Lags(bi)
        var e = 0L
        var k = 0
        while (k + lag < PerWindow) {
          val base = w * PerWindow + k
          val d = if (lag == 0) p(base) else p(base + lag) - p(base)
          e += d * d
          k += 1
        }
        s(w)(bi) = e
        bi += 1
      }
      w += 1
    }
    var h = 0L
    var bi = 0
    while (bi < Lags.length) {
      var t = 0
      while (t < Windows - 1) {
        if (s(t + 1)(bi) > s(t)(bi)) h |= 1L << (bi * (Windows - 1) + t)
        t += 1
      }
      bi += 1
    }
    val spectralBase = (Windows - 1) * Lags.length // 28
    var w2 = 0
    while (w2 < Windows) {
      var b2 = 0
      while (b2 < Lags.length - 1) {
        if (s(w2)(b2 + 1) > s(w2)(b2))
          h |= 1L << (spectralBase + w2 * (Lags.length - 1) + b2)
        b2 += 1
      }
      w2 += 1
    }
    h
  }

  /** (id, afp) per media row — decode + fingerprint in one
    * partition-wise batch pass.
    */
  def fingerprints(media: Dataset[AudioMedia])(
      implicit s: SparkSession): DataFrame = {
    import s.implicits._
    media.mapPartitions(_.map(m =>
        (m.doc_id, fingerprint(Wav.decode(m.payload)))))
      .toDF("id", "afp")
  }

  /** Cluster labels over banded-hamming near-pairs — the [[Perceptual]]
    * machinery at 52 bits. `maxHamming = 3` (default) keeps the 4-band
    * candidate stage exhaustive by pigeonhole.
    */
  def clusters(hashes: DataFrame, idCol: String, hashCol: String,
      maxHamming: Int = 3, bands: Int = 4): DataFrame =
    Perceptual.clusters(hashes, idCol, hashCol, maxHamming, bands, HashBits)

  /** Cross-corpus audio contamination: banded fingerprint matches
    * joined across two clip corpora, never within — the
    * [[Perceptual.crossMatches]] machinery at 52 bits. Output
    * `(a, b, hamming)`, `a` from train, `b` from eval.
    */
  def crossMatches(train: DataFrame, eval: DataFrame, idCol: String,
      hashCol: String, maxHamming: Int = 3, bands: Int = 4): DataFrame =
    Perceptual.crossMatches(train, eval, idCol, hashCol, maxHamming,
      bands, HashBits)
}
