package graft.multimodal

import scala.util.Random

import graft.SparkSpec

/** Property checks for the spectral audio fingerprint: invariance under
  * random integer upsampling factors and random exact gains, on random
  * clips (not just the planted generative family).
  */
class AudioFpPropertySpec extends SparkSpec {

  private def randClip(rnd: Random): Wav.Audio = {
    val n = 200 + rnd.nextInt(1200)
    // amplitudes bounded so x3 gain stays within Short
    Wav.Audio(8000, 1,
      Array.fill(n)((rnd.nextInt(16384) - 8192).toShort))
  }

  test("random clips: fingerprint invariant under integer upsample 2x/3x/4x") {
    val rnd = new Random(99L)
    (1 to 40).foreach { i =>
      val a = randClip(rnd)
      val f0 = AudioFp.fingerprint(a)
      Seq(2, 3, 4).foreach { k =>
        assert(AudioFp.fingerprint(Wav.resample(a, a.frames * k)) === f0,
          s"clip $i upsample x$k")
      }
    }
  }

  test("random clips: fingerprint invariant under exact gain x2/x3") {
    val rnd = new Random(100L)
    (1 to 40).foreach { i =>
      val a = randClip(rnd)
      val f0 = AudioFp.fingerprint(a)
      Seq(2, 3).foreach { c =>
        val g = a.copy(samples = a.samples.map(v => (v * c).toShort))
        assert(AudioFp.fingerprint(g) === f0, s"clip $i gain x$c")
      }
    }
  }

  test("random clips: codec round-trip preserves the fingerprint") {
    val rnd = new Random(101L)
    (1 to 40).foreach { i =>
      val a = randClip(rnd)
      assert(AudioFp.fingerprint(Wav.decode(Wav.encode(a))) ===
        AudioFp.fingerprint(a), s"clip $i")
    }
  }
}
