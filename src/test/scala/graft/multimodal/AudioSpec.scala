package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** WAV codec + spectral fingerprint: round-trip, chunk-walking, the
  * three invariances (re-encode / 2x resample / gain), separation of
  * distinct clips, and cluster detection end-to-end.
  */
class AudioSpec extends SparkSpec {

  private def mk(id: Long, n: Int): Wav.Audio =
    Wav.Audio(8000, 1, Array.tabulate(n)(i =>
      ((((id + 1) * 2654435761L * (i + 3) + i.toLong * (i + 7))
        % 16384L) - 8192L).toShort))

  test("encode -> decode round-trips bit-exactly") {
    val a = mk(5, 777)
    val d = Wav.decode(Wav.encode(a))
    assert(d.sampleRate === a.sampleRate && d.channels === a.channels)
    assert(d.samples.toSeq === a.samples.toSeq)
  }

  test("decode walks extra chunks before data") {
    val a = mk(3, 100)
    val enc = Wav.encode(a)
    // splice a LIST chunk between fmt and data
    val extra = Array[Byte]('L', 'I', 'S', 'T', 4, 0, 0, 0, 'I', 'N', 'F', 'O')
    val spliced = enc.take(36) ++ extra ++ enc.drop(36)
    // RIFF size field is now stale; decode must not rely on it
    val d = Wav.decode(spliced)
    assert(d.samples.toSeq === a.samples.toSeq)
  }

  test("decode rejects non-WAV and truncated payloads") {
    intercept[IllegalArgumentException](Wav.decode("noise".getBytes))
    intercept[IllegalArgumentException](
      Wav.decode(Wav.encode(mk(1, 50)).take(50)))
  }

  test("stereo round-trip and resample keep channel interleave") {
    val st = Wav.Audio(44100, 2, Array.tabulate(400)(i => (i * 37).toShort))
    assert(Wav.decode(Wav.encode(st)).samples.toSeq === st.samples.toSeq)
    val r = Wav.resample(st, st.frames * 2)
    assert(r.frames === st.frames * 2 && r.channels === 2)
    // frame i copies source frame i/2, both channels
    assert(r.samples(10 * 2) === st.samples(5 * 2))
    assert(r.samples(10 * 2 + 1) === st.samples(5 * 2 + 1))
  }

  test("fingerprint invariant to re-encode, 2x resample, and gain") {
    val a = mk(30, 512 + 7 * 8)
    val f0 = AudioFp.fingerprint(a)
    assert(AudioFp.fingerprint(Wav.decode(Wav.encode(a))) === f0)
    assert(AudioFp.fingerprint(Wav.resample(a, a.frames * 2)) === f0)
    val gained = a.copy(samples = a.samples.map(v => (v * 2).toShort))
    assert(AudioFp.fingerprint(gained) === f0)
  }

  test("distinct clips separate beyond the verify threshold") {
    val fps = (1 to 40).map(k => AudioFp.fingerprint(mk(k * 10L, 600 + k)))
    val hams = for {
      i <- fps.indices; j <- fps.indices if i < j
    } yield java.lang.Long.bitCount(fps(i) ^ fps(j))
    assert(hams.min > 3, s"min inter-clip hamming ${hams.min}")
  }

  test("clusters: planted variants collapse, originals stay distinct") {
    implicit val sp = spark
    import spark.implicits._
    val base = (1 to 12).map(k => (k.toLong, mk(k.toLong, 500 + k * 16)))
    val media = base.flatMap { case (id, a) =>
      val variants = Seq(
        AudioFp.AudioMedia(id * 4, Wav.encode(a), 0)) ++
        (if (id % 3 == 0) Seq(AudioFp.AudioMedia(id * 4 + 1,
          Wav.encode(Wav.decode(Wav.encode(a))), 0)) else Nil) ++
        (if (id % 5 == 0) Seq(AudioFp.AudioMedia(id * 4 + 2,
          Wav.encode(Wav.resample(a, a.frames * 2)), 0)) else Nil)
      variants
    }
    val ds = spark.createDataset(media)
    val out = AudioFp.clusters(AudioFp.fingerprints(ds), "id", "afp")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(12L) === out(13L), "re-encoded copy clusters with original")
    assert(out(20L) === out(22L), "resampled copy clusters with original")
    assert(out(4L) !== out(8L), "distinct clips stay apart")
  }
}
