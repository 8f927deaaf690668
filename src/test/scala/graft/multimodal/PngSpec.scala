package graft.multimodal

import java.util.zip.{CRC32, Deflater}

import org.scalatest.funsuite.AnyFunSuite

/** PNG codec: encode→decode round-trip, all five row filters, every
  * 8-bit color type, CRC/truncation/garbage rejection, and BMP↔PNG
  * pixel equivalence through the magic-sniffing door.
  */
class PngSpec extends AnyFunSuite {

  private def img(w: Int, h: Int, seed: Int): Bmp.Image = {
    val rnd = new scala.util.Random(seed)
    Bmp.Image(w, h, Array.fill(w * h * 3)(rnd.nextInt(256).toByte))
  }

  test("encode -> decode round-trips bit-exactly") {
    for ((w, h, seed) <- Seq((1, 1, 1), (8, 8, 2), (13, 7, 3), (64, 3, 4))) {
      val i = img(w, h, seed)
      val back = Png.decode(Png.encode(i))
      assert(back.width == w && back.height == h)
      assert(back.rgb.sameElements(i.rgb), s"${w}x$h")
    }
  }

  test("PNG of a BMP decodes to identical pixels via the sniffing door") {
    val i = img(16, 9, 7)
    val viaBmp = Multimodal.decodeImage(Bmp.encode(i))
    val viaPng = Multimodal.decodeImage(Png.encode(i))
    assert(viaBmp.rgb.sameElements(viaPng.rgb))
    assert(Perceptual.dHash(viaBmp) == Perceptual.dHash(viaPng))
  }

  // -- hand-built PNGs: spec-side writer so the decoder is tested
  //    against independently constructed files, not its own encoder --

  private def be(v: Int): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes("US-ASCII")
    val crc = new CRC32(); crc.update(t); crc.update(data)
    be(data.length) ++ t ++ data ++ be(crc.getValue.toInt)
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater(); d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end(); out.toByteArray
  }

  private val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    .map(_.toByte)

  private def png(w: Int, h: Int, colorType: Int, raw: Array[Byte],
      plte: Option[Array[Byte]] = None): Array[Byte] = {
    val ihdr = be(w) ++ be(h) ++
      Array[Byte](8, colorType.toByte, 0, 0, 0)
    sig ++ chunk("IHDR", ihdr) ++
      plte.map(chunk("PLTE", _)).getOrElse(Array.emptyByteArray) ++
      chunk("IDAT", deflate(raw)) ++ chunk("IEND", Array.emptyByteArray)
  }

  /** Filter a scanline the PNG way (the inverse of what decode does). */
  private def filterRow(f: Int, row: Array[Byte], prior: Array[Byte],
      bpp: Int): Array[Byte] = {
    def u(b: Byte) = b & 0xff
    f.toByte +: row.indices.map { i =>
      val x = u(row(i))
      val a = if (i >= bpp) u(row(i - bpp)) else 0
      val b = u(prior(i))
      val c = if (i >= bpp) u(prior(i - bpp)) else 0
      val pred = f match {
        case 0 => 0
        case 1 => a
        case 2 => b
        case 3 => (a + b) / 2
        case 4 =>
          val p = a + b - c
          val pa = math.abs(p - a); val pb = math.abs(p - b)
          val pc = math.abs(p - c)
          if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
      }
      ((x - pred) & 0xff).toByte
    }.toArray
  }

  test("all five filters decode correctly (truecolor)") {
    val w = 5; val h = 5; val bpp = 3
    val i = img(w, h, 11)
    val rows = (0 until h).map(y =>
      java.util.Arrays.copyOfRange(i.rgb, y * w * 3, (y + 1) * w * 3))
    for (f <- 0 to 4) {
      val raw = new java.io.ByteArrayOutputStream()
      var prior = new Array[Byte](w * bpp)
      rows.foreach { r =>
        raw.write(filterRow(f, r, prior, bpp)); prior = r
      }
      val back = Png.decode(png(w, h, 2, raw.toByteArray))
      assert(back.rgb.sameElements(i.rgb), s"filter $f")
    }
    // mixed filters across rows
    val raw = new java.io.ByteArrayOutputStream()
    var prior = new Array[Byte](w * bpp)
    rows.zipWithIndex.foreach { case (r, y) =>
      raw.write(filterRow(y % 5, r, prior, bpp)); prior = r
    }
    assert(Png.decode(png(w, h, 2, raw.toByteArray)).rgb
      .sameElements(i.rgb), "mixed filters")
  }

  test("grayscale, gray+alpha, RGBA, and indexed color types") {
    val w = 4; val h = 2
    val gray = Array.tabulate(w * h)(i => (i * 31).toByte)
    def expand(g: Array[Byte]) = g.flatMap(b => Array(b, b, b))
    // color type 0: gray
    val raw0 = (0 until h).flatMap(y =>
      0.toByte +: gray.slice(y * w, (y + 1) * w).toSeq).toArray
    assert(Png.decode(png(w, h, 0, raw0)).rgb.sameElements(expand(gray)))
    // color type 4: gray + alpha (alpha dropped)
    val raw4 = (0 until h).flatMap(y =>
      0.toByte +: gray.slice(y * w, (y + 1) * w)
        .flatMap(g => Array(g, 0x80.toByte)).toSeq).toArray
    assert(Png.decode(png(w, h, 4, raw4)).rgb.sameElements(expand(gray)))
    // color type 6: RGBA (alpha dropped)
    val rgb = img(w, h, 13).rgb
    val raw6 = (0 until h).flatMap { y =>
      0.toByte +: (0 until w).flatMap { x =>
        val p = (y * w + x) * 3
        Seq(rgb(p), rgb(p + 1), rgb(p + 2), 0xff.toByte)
      }
    }.toArray
    assert(Png.decode(png(w, h, 6, raw6)).rgb.sameElements(rgb))
    // color type 3: indexed with a 4-entry palette
    val plte = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120)
    val idxs = Array.tabulate(w * h)(i => (i % 4).toByte)
    val raw3 = (0 until h).flatMap(y =>
      0.toByte +: idxs.slice(y * w, (y + 1) * w).toSeq).toArray
    val got = Png.decode(png(w, h, 3, raw3, Some(plte)))
    val want = idxs.flatMap(i => plte.slice(i * 3, i * 3 + 3))
    assert(got.rgb.sameElements(want))
  }

  test("corruption is loud: bad magic, bad CRC, truncation, torn zlib") {
    val good = Png.encode(img(6, 6, 17))
    intercept[IllegalArgumentException](Png.decode(good.drop(1)))
    val badCrc = good.clone()
    badCrc(good.length - 5) = (badCrc(good.length - 5) ^ 0xff).toByte
    intercept[IllegalArgumentException](Png.decode(badCrc))
    intercept[IllegalArgumentException](
      Png.decode(good.take(good.length - 20)))
    // valid framing, but the IDAT inflates to too few bytes
    val short = sig ++ chunk("IHDR",
      be(2) ++ be(2) ++ Array[Byte](8, 2, 0, 0, 0)) ++
      chunk("IDAT", deflate(Array[Byte](0, 1, 2, 3))) ++
      chunk("IEND", Array.emptyByteArray)
    intercept[IllegalArgumentException](Png.decode(short))
    intercept[IllegalArgumentException](
      Multimodal.decodeImage(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9)))
  }

  test("interlaced and 16-bit PNGs are rejected, not mis-decoded") {
    val i16 = sig ++ chunk("IHDR",
      be(2) ++ be(2) ++ Array[Byte](16, 2, 0, 0, 0)) ++
      chunk("IDAT", deflate(new Array[Byte](2 * (1 + 2 * 6)))) ++
      chunk("IEND", Array.emptyByteArray)
    intercept[IllegalArgumentException](Png.decode(i16))
    val adam7 = sig ++ chunk("IHDR",
      be(2) ++ be(2) ++ Array[Byte](8, 2, 0, 0, 1)) ++
      chunk("IDAT", deflate(new Array[Byte](2 * (1 + 2 * 3)))) ++
      chunk("IEND", Array.emptyByteArray)
    intercept[IllegalArgumentException](Png.decode(adam7))
  }
}
