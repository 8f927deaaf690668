package graft.multimodal

/** Minimal REAL codec for BASELINE GRAYSCALE JPEG (ITU-T.81 sequential
  * DCT, single 8-bit component, 1×1 sampling): pure JVM, no external
  * library. The dominant real-corpus image format joins the BMP/PNG
  * codec set behind [[Multimodal.decodeImage]] magic sniffing.
  *
  * What is REAL here: full marker structure (SOI/DQT/SOF0/DHT/SOS/EOI,
  * APPn/COM skipped), spec Annex-K standard huffman tables built by the
  * spec's code-assignment algorithm, zigzag, DC prediction + EXTEND
  * coding, run-length AC with ZRL/EOB, 0xFF byte stuffing, 2-D DCT.
  * [[encode]] writes quant-table-all-ones (maximum-quality) streams;
  * [[decode]] reads ANY 8-bit quant table a conformant baseline
  * grayscale writer emits.
  *
  * Scope boundary (loud, never silent): progressive (SOF2),
  * multi-component color, 16-bit quant tables, and restart intervals
  * throw `IllegalArgumentException` — decoding those as garbage pixels
  * would poison dedup silently.
  *
  * JPEG is LOSSY: decode(encode(img)) is NOT bit-exact (DCT roundtrip
  * error ≲ 2 gray levels at quant 1). Consumers that need exactness
  * use BMP/PNG; the perceptual-dedup path (q201) plants images whose
  * dHash sample margins exceed the error bound, so every HASH is
  * bit-exact even though pixels are not — asserted in JpegSpec.
  */
object Jpeg {

  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // Annex K.3 / K.5: standard luminance DC and AC huffman tables
  private val DcBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  private val AcBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** Spec C.2: (bits, huffvals) → symbol → (code, length). */
  private def buildEncodeTable(bits: Array[Int],
      vals: Array[Int]): Array[(Int, Int)] = {
    val table = new Array[(Int, Int)](256)
    var code = 0
    var k = 0
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l)) {
        table(vals(k)) = (code, l)
        code += 1; k += 1; i += 1
      }
      code <<= 1
      l += 1
    }
    table
  }

  /** Spec F.2.2.3 decode tables: (mincode, maxcode, valptr) per length. */
  private final class DecodeTable(bits: Array[Int], val vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l) == 0) { maxCode(l) = -1 }
        else {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l); k += bits(l)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
  }

  private lazy val dcEnc = buildEncodeTable(DcBits, DcVals)
  private lazy val acEnc = buildEncodeTable(AcBits, AcVals)

  private val CosTable: Array[Double] = {
    val t = new Array[Double](8 * 8) // t(u*8+x) = cos((2x+1)uπ/16)
    var u = 0
    while (u < 8) {
      var x = 0
      while (x < 8) {
        t(u * 8 + x) = math.cos((2 * x + 1) * u * math.Pi / 16.0)
        x += 1
      }
      u += 1
    }
    t
  }
  private def cScale(u: Int): Double = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >>> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (nbits > 0) { // pad with 1s per spec
      acc = (acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)
      out.write(acc)
      if (acc == 0xff) out.write(0x00)
      acc = 0; nbits = 0
    }
  }

  private def category(v: Int): Int = {
    var a = math.abs(v)
    var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  /** Encode the image's LUMA as a baseline grayscale JPEG with an
    * all-ones quant table (maximum quality). Luma is the classic
    * integer approximation `(77r + 150g + 29b + 128) >> 8` — exactly v
    * for gray pixels (r=g=b=v).
    */
  def encode(img: Bmp.Image): Array[Byte] = {
    val w = img.width; val h = img.height
    require(w > 0 && h > 0, "positive dimensions")
    val gray = new Array[Int](w * h)
    var i = 0
    while (i < w * h) {
      val r = img.rgb(3 * i) & 0xff
      val g = img.rgb(3 * i + 1) & 0xff
      val b = img.rgb(3 * i + 2) & 0xff
      gray(i) = (77 * r + 150 * g + 29 * b + 128) >> 8
      i += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def u16(v: Int): Unit = { out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
    marker(0xd8) // SOI
    marker(0xdb); u16(2 + 1 + 64); out.write(0x00) // DQT, 8-bit table 0
    var z = 0
    while (z < 64) { out.write(1); z += 1 }
    marker(0xc0); u16(11) // SOF0
    out.write(8); u16(h); u16(w); out.write(1) // precision, dims, 1 comp
    out.write(1); out.write(0x11); out.write(0) // comp 1, 1x1, quant 0
    def dht(cls: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); u16(2 + 1 + 16 + vals.length); out.write(cls << 4)
      var l = 1
      while (l <= 16) { out.write(bits(l)); l += 1 }
      vals.foreach(out.write)
    }
    dht(0, DcBits, DcVals)
    dht(1, AcBits, AcVals)
    marker(0xda); u16(8); out.write(1) // SOS, 1 comp
    out.write(1); out.write(0x00) // comp 1 uses DC0/AC0
    out.write(0); out.write(63); out.write(0) // Ss, Se, AhAl
    val bw = new BitWriter(out)
    val bw8 = (w + 7) / 8
    val bh8 = (h + 7) / 8
    val coef = new Array[Int](64)
    val blk = new Array[Double](64)
    var dcPred = 0
    var by = 0
    while (by < bh8) {
      var bx = 0
      while (bx < bw8) {
        // level-shifted block, edge-replicated padding
        var y = 0
        while (y < 8) {
          val sy = math.min(by * 8 + y, h - 1)
          var x = 0
          while (x < 8) {
            val sx = math.min(bx * 8 + x, w - 1)
            blk(y * 8 + x) = gray(sy * w + sx) - 128.0
            x += 1
          }
          y += 1
        }
        // forward DCT + quantize (q = 1 → plain round)
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            var acc = 0.0
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                acc += blk(yy * 8 + xx) * CosTable(u * 8 + xx) * CosTable(v * 8 + yy)
                xx += 1
              }
              yy += 1
            }
            coef(v * 8 + u) = math.round(0.25 * cScale(u) * cScale(v) * acc).toInt
            u += 1
          }
          v += 1
        }
        // entropy-code in zigzag order
        val dc = coef(0)
        val diff = dc - dcPred
        dcPred = dc
        val s = category(diff)
        val (dcode, dlen) = dcEnc(s)
        bw.put(dcode, dlen)
        if (s > 0)
          bw.put(if (diff >= 0) diff else diff + (1 << s) - 1, s)
        var run = 0
        var k = 1
        while (k < 64) {
          val ac = coef(ZigZag(k))
          if (ac == 0) run += 1
          else {
            while (run >= 16) {
              val (zc, zl) = acEnc(0xf0); bw.put(zc, zl); run -= 16
            }
            val ss = category(ac)
            val (c, l) = acEnc((run << 4) | ss)
            bw.put(c, l)
            bw.put(if (ac >= 0) ac else ac + (1 << ss) - 1, ss)
            run = 0
          }
          k += 1
        }
        if (run > 0) { val (c, l) = acEnc(0x00); bw.put(c, l) } // EOB
        bx += 1
      }
      by += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    def bit(): Int = {
      if (nbits == 0) {
        require(pos < data.length, "entropy stream truncated")
        var b = data(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          require(pos < data.length, "entropy stream truncated at 0xFF")
          val m = data(pos) & 0xff
          if (m == 0x00) pos += 1 // stuffed byte
          else throw new IllegalArgumentException(
            f"unexpected marker 0xFF$m%02X inside entropy data (over-read " +
              "past the scan, or restart intervals — both out of scope)")
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >>> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def decodeSym(t: DecodeTable): Int = {
      var code = bit()
      var l = 1
      while (l <= 16) {
        if (t.maxCode(l) >= 0 && code <= t.maxCode(l))
          return t.vals(t.valPtr(l) + code - t.minCode(l))
        code = (code << 1) | bit()
        l += 1
      }
      throw new IllegalArgumentException("invalid huffman code")
    }
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** Decode a baseline grayscale JPEG to a gray [[Bmp.Image]]
    * (r=g=b). Loud on anything outside the supported scope.
    */
  def decode(payload: Array[Byte]): Bmp.Image = {
    require(payload.length >= 4 && (payload(0) & 0xff) == 0xff &&
      (payload(1) & 0xff) == 0xd8, "not a JPEG (missing SOI)")
    var pos = 2
    def u16(at: Int): Int =
      ((payload(at) & 0xff) << 8) | (payload(at + 1) & 0xff)
    var quant: Array[Int] = null
    var dcTab: DecodeTable = null
    var acTab: DecodeTable = null
    var w = 0; var h = 0
    var sosAt = -1
    while (sosAt < 0) {
      require(pos + 4 <= payload.length, "truncated marker stream")
      require((payload(pos) & 0xff) == 0xff, "marker desync")
      val m = payload(pos + 1) & 0xff
      val len = u16(pos + 2)
      val body = pos + 4
      m match {
        case 0xdb =>
          var at = body
          while (at < pos + 2 + len) {
            val pq = (payload(at) & 0xff) >> 4
            val tq = payload(at) & 0x0f
            require(pq == 0, "16-bit quant tables out of codec scope")
            val t = new Array[Int](64)
            var k = 0
            while (k < 64) { t(k) = payload(at + 1 + k) & 0xff; k += 1 }
            if (tq == 0) quant = t
            at += 65
          }
        case 0xc0 =>
          require((payload(body) & 0xff) == 8, "only 8-bit precision")
          h = u16(body + 1); w = u16(body + 3)
          val nComp = payload(body + 5) & 0xff
          require(nComp == 1,
            s"only grayscale (1 component) in codec scope; got $nComp")
          require((payload(body + 7) & 0xff) == 0x11, "only 1x1 sampling")
        case 0xc2 => throw new IllegalArgumentException(
          "progressive JPEG (SOF2) out of codec scope")
        case 0xc4 =>
          var at = body
          while (at < pos + 2 + len) {
            val cls = (payload(at) & 0xff) >> 4
            val bits = new Array[Int](17)
            var total = 0
            var l = 1
            while (l <= 16) {
              bits(l) = payload(at + l) & 0xff; total += bits(l); l += 1
            }
            val vals = new Array[Int](total)
            var k = 0
            while (k < total) { vals(k) = payload(at + 17 + k) & 0xff; k += 1 }
            val t = new DecodeTable(bits, vals)
            if (cls == 0) dcTab = t else acTab = t
            at += 17 + total
          }
        case 0xdd => throw new IllegalArgumentException(
          "restart intervals (DRI) out of codec scope")
        case 0xda => sosAt = body
        case _ => // APPn, COM, others: skip
      }
      if (sosAt < 0) pos = pos + 2 + len
    }
    require(quant != null && dcTab != null && acTab != null && w > 0 && h > 0,
      "missing DQT/DHT/SOF0 before SOS")
    // SOS body: Ns + 2·Ns component specs + Ss/Se/AhAl → entropy data
    val br = new BitReader(payload,
      sosAt + 1 + 2 * (payload(sosAt) & 0xff) + 3)
    val bw8 = (w + 7) / 8
    val bh8 = (h + 7) / 8
    val gray = new Array[Int](w * h)
    val coef = new Array[Int](64)
    var dcPred = 0
    var by = 0
    while (by < bh8) {
      var bx = 0
      while (bx < bw8) {
        java.util.Arrays.fill(coef, 0)
        val s = br.decodeSym(dcTab)
        dcPred += extend(br.bits(s), s)
        coef(0) = dcPred * quant(0)
        var k = 1
        var eob = false
        while (k < 64 && !eob) {
          val rs = br.decodeSym(acTab)
          val run = rs >> 4
          val size = rs & 0x0f
          if (size == 0) {
            if (run == 15) k += 16 // ZRL
            else eob = true
          } else {
            k += run
            require(k < 64, "AC run overflows block")
            coef(ZigZag(k)) = extend(br.bits(size), size) * quant(k)
            k += 1
          }
        }
        // inverse DCT
        var y = 0
        while (y < 8) {
          val py = by * 8 + y
          var x = 0
          while (x < 8) {
            val px = bx * 8 + x
            if (py < h && px < w) {
              var acc = 0.0
              var v = 0
              while (v < 8) {
                var u = 0
                while (u < 8) {
                  val c = coef(v * 8 + u)
                  if (c != 0)
                    acc += cScale(u) * cScale(v) * c *
                      CosTable(u * 8 + x) * CosTable(v * 8 + y)
                  u += 1
                }
                v += 1
              }
              val p = math.max(0, math.min(255,
                math.round(0.25 * acc + 128.0).toInt))
              gray(py * w + px) = p
            }
            x += 1
          }
          y += 1
        }
        bx += 1
      }
      by += 1
    }
    val rgb = new Array[Byte](w * h * 3)
    var i = 0
    while (i < w * h) {
      val v = gray(i).toByte
      rgb(3 * i) = v; rgb(3 * i + 1) = v; rgb(3 * i + 2) = v
      i += 1
    }
    Bmp.Image(w, h, rgb)
  }
}
