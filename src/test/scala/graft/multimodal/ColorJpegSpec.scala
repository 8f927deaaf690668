package graft.multimodal

import graft.SparkSpec

/** Baseline COLOR JPEG (3-component YCbCr, 4:4:4 and 4:2:0): real
  * color recovery, roundtrip bounds, dHash identity with the BMP
  * twin, and the loud sampling scope boundary.
  */
class ColorJpegSpec extends SparkSpec {

  private def img(w: Int, h: Int)(f: (Int, Int) => (Int, Int, Int)): Bmp.Image = {
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = f(x, y)
      val p = (y * w + x) * 3
      rgb(p) = r.toByte; rgb(p + 1) = g.toByte; rgb(p + 2) = b.toByte
    }
    Bmp.Image(w, h, rgb)
  }

  private def maxErr(a: Bmp.Image, b: Bmp.Image): Int =
    a.rgb.zip(b.rgb).map { case (x, y) =>
      math.abs((x & 0xff) - (y & 0xff)) }.max

  test("flat color blocks roundtrip tightly at 4:4:4 and 4:2:0") {
    // strong saturated casts, 16x16-aligned so 4:2:0 sees flat chroma
    val casts = Array((200, 40, 40), (40, 180, 60), (50, 60, 210), (128, 128, 128))
    val im = img(64, 48) { (x, y) => casts(((x / 16) + (y / 16)) % 4) }
    for (sub <- Seq(false, true)) {
      val back = Jpeg.decode(Jpeg.encodeColor(im, sub))
      assert(back.width == 64 && back.height == 48)
      // integer YCbCr transform + DCT roundtrip: a few levels/channel
      assert(maxErr(im, back) <= 6, s"subsample=$sub err=${maxErr(im, back)}")
    }
  }

  test("red stays red: hue survives the YCbCr roundtrip") {
    val im = img(16, 16)((_, _) => (220, 30, 30))
    val back = Jpeg.decode(Jpeg.encodeColor(im, subsample = true))
    val r = back.rgb(0) & 0xff; val g = back.rgb(1) & 0xff
    val b = back.rgb(2) & 0xff
    assert(r > 180 && g < 80 && b < 80, s"($r,$g,$b)")
  }

  test("4:2:0 chroma is genuinely subsampled (smaller stream than 4:4:4 on chroma-busy content)") {
    // 16x16-aligned casts so BOTH layouts see block-flat chroma — the
    // 4:2:0 stream then carries a quarter of the chroma blocks
    val im = img(64, 64) { (x, y) =>
      val v = 60 + 8 * ((x / 8 + y / 8) % 10)
      if ((x / 16 + y / 16) % 2 == 0) (v + 40, v - 20, v - 10)
      else (v - 40, v + 20, v + 10)
    }
    val full = Jpeg.encodeColor(im, subsample = false)
    val sub = Jpeg.encodeColor(im, subsample = true)
    assert(sub.length < full.length)
    // and both still decode to roughly the same luma
    val df = Jpeg.decode(full); val ds = Jpeg.decode(sub)
    def luma(i: Bmp.Image, p: Int): Int =
      (77 * (i.rgb(3 * p) & 0xff) + 150 * (i.rgb(3 * p + 1) & 0xff) +
        29 * (i.rgb(3 * p + 2) & 0xff) + 128) >> 8
    val err = (0 until 64 * 64).map(p => math.abs(luma(df, p) - luma(ds, p))).max
    assert(err <= 8, s"luma gap $err")
  }

  test("margin-planted color image dHashes identically to its BMP twin, both samplings") {
    // per-cell luma margins (>=12 apart) with a uniform color cast:
    // uniform chroma shifts every dHash sample equally, so the
    // comparisons — and the hash — equal the lossless twin's
    def cell(gx: Int, gy: Int): Int =
      (30 + (graft.functions.TextHash.md5Low60(s"cjs:$gx:$gy") % 5) * 40 +
        ((gx + gy) % 2) * 12).toInt
    val im = img(64, 64) { (x, y) =>
      val l = cell(x / 8, y / 8) + ((x + y) % 2) * 2
      (l + 16, l - 8, l - 4)
    }
    val bmpHash = Perceptual.dHash(im)
    for (sub <- Seq(false, true)) {
      val jh = Perceptual.dHash(Jpeg.decode(Jpeg.encodeColor(im, sub)))
      assert(jh == bmpHash, s"subsample=$sub")
    }
  }

  test("4:2:2 sampling and other exotic layouts are loud") {
    val enc = Jpeg.encodeColor(img(16, 16)((_, _) => (100, 120, 140)),
      subsample = false)
    // rewrite luma sampling 0x11 -> 0x21 (4:2:2) inside SOF0:
    // FF C0 len2 prec dims4 ncomp id hv ... -> hv at sof+11
    val sof = enc.indexOfSlice(Seq(0xff.toByte, 0xc0.toByte))
    val patched = enc.clone()
    assert((patched(sof + 11) & 0xff) == 0x11)
    patched(sof + 11) = 0x21.toByte
    intercept[IllegalArgumentException](Jpeg.decode(patched))
  }

  test("grayscale encode bytes are unchanged by the color refactor (golden prefix)") {
    // the gray path still writes 1-component SOF0 with table 0 only
    val gray = img(16, 16)((x, y) => { val v = 20 + 10 * ((x / 8 + y / 8) % 4); (v, v, v) })
    val enc = Jpeg.encode(gray)
    val sof = enc.indexOfSlice(Seq(0xff.toByte, 0xc0.toByte))
    assert((enc(sof + 2 + 2 + 5) & 0xff) == 1) // nComp
    val back = Jpeg.decode(enc)
    assert(maxErr(gray, back) <= 1)
  }
}
