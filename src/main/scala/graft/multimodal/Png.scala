package graft.multimodal

import java.util.zip.{CRC32, Deflater, Inflater}

/** Minimal REAL codec for PNG (ISO/IEC 15948, the public W3C spec):
  * pure JVM — chunk framing + CRC-32 via `java.util.zip.CRC32`, the
  * zlib stream via `java.util.zip.Inflater`/`Deflater`. Decodes 8-bit
  * non-interlaced images of every PNG color type (grayscale, truecolor,
  * indexed/PLTE, gray+alpha, RGBA — alpha dropped) with all five row
  * filters (None/Sub/Up/Average/Paeth), into the SAME bitmap value
  * [[Bmp.Image]] the BMP codec produces — so dHash, the incremental/
  * streaming perceptual indexes, and the cross-corpus matchers run
  * UNCHANGED over PNG corpora (real corpora are PNG/JPEG, not BMP).
  * [[encode]] writes 8-bit truecolor, filter 0, one IDAT; encode →
  * decode round-trips bit-exactly (PngSpec).
  *
  * Every structural violation (magic, CRC, truncation, unsupported
  * depth/interlace, inflate garbage) throws — loud beats a plausible
  * wrong answer at a codec boundary, the [[Bmp.decode]] contract.
  */
object Png {

  private val Signature: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def getIntBE(a: Array[Byte], off: Int): Int =
    ((a(off) & 0xff) << 24) | ((a(off + 1) & 0xff) << 16) |
      ((a(off + 2) & 0xff) << 8) | (a(off + 3) & 0xff)

  private def putIntBE(a: Array[Byte], off: Int, v: Int): Unit = {
    a(off) = (v >>> 24).toByte
    a(off + 1) = (v >>> 16).toByte
    a(off + 2) = (v >>> 8).toByte
    a(off + 3) = v.toByte
  }

  private def chunk(out: java.io.ByteArrayOutputStream, typ: String,
      data: Array[Byte]): Unit = {
    val len = new Array[Byte](4)
    putIntBE(len, 0, data.length)
    out.write(len)
    val t = typ.getBytes("US-ASCII")
    out.write(t)
    out.write(data)
    val crc = new CRC32()
    crc.update(t)
    crc.update(data)
    val c = new Array[Byte](4)
    putIntBE(c, 0, crc.getValue.toInt)
    out.write(c)
  }

  def encode(img: Bmp.Image): Array[Byte] = {
    val Bmp.Image(w, h, rgb) = img
    require(w > 0 && h > 0, "positive dimensions")
    require(rgb.length == w * h * 3, s"rgb length ${rgb.length} != ${w * h * 3}")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature)
    val ihdr = new Array[Byte](13)
    putIntBE(ihdr, 0, w)
    putIntBE(ihdr, 4, h)
    ihdr(8) = 8   // bit depth
    ihdr(9) = 2   // color type: truecolor
    // 10..12: compression 0, filter method 0, interlace 0
    chunk(out, "IHDR", ihdr)
    // raw scanlines: filter byte 0 + RGB row
    val raw = new Array[Byte](h * (1 + w * 3))
    var y = 0
    while (y < h) {
      System.arraycopy(rgb, y * w * 3, raw, y * (1 + w * 3) + 1, w * 3)
      y += 1
    }
    val deflater = new Deflater()
    deflater.setInput(raw)
    deflater.finish()
    val buf = new Array[Byte](8192)
    val z = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) z.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    chunk(out, "IDAT", z.toByteArray)
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  def decode(payload: Array[Byte]): Bmp.Image = {
    require(payload.length >= 8 + 25, "truncated PNG")
    require(Signature.indices.forall(i => payload(i) == Signature(i)),
      "not a PNG (signature)")
    var off = 8
    var w = 0; var h = 0; var bitDepth = 0; var colorType = 0
    var sawIhdr = false; var sawIend = false
    var palette: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    while (!sawIend) {
      require(off + 8 <= payload.length, "truncated chunk header")
      val len = getIntBE(payload, off)
      require(len >= 0 && off + 12 + len <= payload.length,
        "truncated chunk data")
      val typ = new String(payload, off + 4, 4, "US-ASCII")
      val crc = new CRC32()
      crc.update(payload, off + 4, 4 + len)
      require(crc.getValue.toInt == getIntBE(payload, off + 8 + len),
        s"CRC mismatch in $typ chunk")
      typ match {
        case "IHDR" =>
          require(!sawIhdr && len == 13, "bad IHDR")
          w = getIntBE(payload, off + 8)
          h = getIntBE(payload, off + 12)
          bitDepth = payload(off + 16) & 0xff
          colorType = payload(off + 17) & 0xff
          require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
          require(bitDepth == 8, "only 8-bit depth supported")
          require(Set(0, 2, 3, 4, 6).contains(colorType),
            s"bad color type $colorType")
          require((payload(off + 18) & 0xff) == 0, "bad compression method")
          require((payload(off + 19) & 0xff) == 0, "bad filter method")
          require((payload(off + 20) & 0xff) == 0,
            "only non-interlaced supported")
          sawIhdr = true
        case "PLTE" =>
          require(len % 3 == 0, "bad PLTE length")
          palette = java.util.Arrays.copyOfRange(payload, off + 8,
            off + 8 + len)
        case "IDAT" => idat.write(payload, off + 8, len)
        case "IEND" => sawIend = true
        case _ => () // ancillary chunk: skip
      }
      off += 12 + len
    }
    require(sawIhdr, "no IHDR")
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
    }
    if (colorType == 3) require(palette != null, "indexed PNG without PLTE")
    val bpp = channels // bytes per pixel at depth 8
    val stride = w * bpp
    val raw = inflate(idat.toByteArray, h * (1 + stride))
    // de-filter in place into `prior`-relative scanlines
    val cur = new Array[Byte](stride)
    val prior = new Array[Byte](stride)
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val rowOff = y * (1 + stride)
      val filter = raw(rowOff) & 0xff
      var i = 0
      while (i < stride) {
        val x = raw(rowOff + 1 + i) & 0xff
        val a = if (i >= bpp) cur(i - bpp) & 0xff else 0
        val b = prior(i) & 0xff
        val c = if (i >= bpp) prior(i - bpp) & 0xff else 0
        val v = filter match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + (a + b) / 2
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b)
            val pc = math.abs(p - c)
            x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
          case other =>
            throw new IllegalArgumentException(s"bad filter type $other")
        }
        cur(i) = (v & 0xff).toByte
        i += 1
      }
      // expand the de-filtered scanline to RGB
      var px = 0
      while (px < w) {
        val d = (y * w + px) * 3
        colorType match {
          case 0 | 4 =>
            val g = cur(px * bpp)
            rgb(d) = g; rgb(d + 1) = g; rgb(d + 2) = g
          case 2 | 6 =>
            rgb(d) = cur(px * bpp)
            rgb(d + 1) = cur(px * bpp + 1)
            rgb(d + 2) = cur(px * bpp + 2)
          case 3 =>
            val idx = (cur(px) & 0xff) * 3
            require(idx + 2 < palette.length, "palette index out of range")
            rgb(d) = palette(idx)
            rgb(d + 1) = palette(idx + 1)
            rgb(d + 2) = palette(idx + 2)
        }
        px += 1
      }
      System.arraycopy(cur, 0, prior, 0, stride)
      y += 1
    }
    Bmp.Image(w, h, rgb)
  }

  private def inflate(z: Array[Byte], expected: Int): Array[Byte] = {
    val inflater = new Inflater()
    inflater.setInput(z)
    val out = new Array[Byte](expected)
    var got = 0
    try {
      while (got < expected && !inflater.finished()) {
        val n = inflater.inflate(out, got, expected - got)
        require(n > 0 || inflater.finished(),
          "truncated or garbage zlib stream")
        got += n
      }
      require(got == expected,
        s"pixel data: got $got bytes, expected $expected")
      // the stream must TERMINATE at exactly `expected` bytes: an IDAT
      // holding more scanlines than IHDR's height would otherwise
      // decode to a plausible truncated image instead of throwing
      // (loud-codec-boundary contract). One more inflate drains the
      // final-block end + adler32 and must produce nothing.
      val probe = new Array[Byte](1)
      val surplus = inflater.inflate(probe, 0, 1)
      require(surplus == 0 && inflater.finished(),
        "zlib stream continues past the IHDR-derived pixel size")
    } finally inflater.end()
    out
  }
}
