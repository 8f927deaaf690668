package graft.multimodal

/** Minimal REAL codec for BASELINE JPEG (ITU-T.81 sequential DCT,
  * 8-bit): grayscale AND 3-component YCbCr color with 4:4:4 or 4:2:0
  * chroma subsampling — pure JVM, no external library. The dominant
  * real-corpus image class (color baseline) joins the BMP/PNG codec
  * set behind [[Multimodal.decodeImage]] magic sniffing; color images
  * feed the SAME dHash chain through their decoded pixels
  * (format-independent perceptual identity, the q174/q175 posture).
  *
  * What is REAL here: full marker structure (SOI/DQT/SOF0/DHT/SOS/EOI,
  * APPn/COM skipped), spec Annex-K standard huffman tables (luminance
  * K.3/K.5 AND chrominance K.4/K.6) built by the spec's
  * code-assignment algorithm, per-component quant/huffman table
  * selection, MCU interleaving with 2×2 luma sampling for 4:2:0 and
  * 2×1 for 4:2:2,
  * zigzag, DC prediction + EXTEND coding, run-length AC with ZRL/EOB,
  * 0xFF byte stuffing, 2-D DCT, JFIF integer YCbCr↔RGB. [[encode]] /
  * [[encodeColor]] write quant-table-all-ones (maximum-quality)
  * streams; [[decode]] reads ANY 8-bit quant tables a conformant
  * baseline writer emits.
  *
  * RESTART MARKERS (DRI/RSTn) are in scope on BOTH sides: real crawl
  * JPEGs carry them near-universally (cameras and encoders emit them
  * for error resilience), so a decoder that rejects DRI drops most of
  * the real corpus from the perceptual-dedup path. [[encode]] /
  * [[encodeColor]] take a `restartInterval` (0 = none, byte-identical
  * to the pre-DRI streams); [[decode]] honors the DRI segment —
  * at each interval boundary it discards the padding bits, consumes
  * the RSTn marker (verifying the 0–7 modulo sequence), and resets
  * every DC predictor, per T.81 §E.2.4/F.2.1.3.1.
  *
  * PROGRESSIVE (SOF2) is in scope for BOTH spectral selection AND
  * successive approximation: [[encodeProgressive]] writes the classic
  * scripts (spectral-only: interleaved DC + per-component AC bands
  * 1–5 / 6–63; `sa = true`: the libjpeg-style coarse-to-fine script —
  * DC at Al=1 + AC bands at Al=2, then AC refinements at Al=1/Al=0
  * with correction bits and EOB runs carrying buffered corrections,
  * plus the DC refinement bit) with a self-describing EOBn-bearing AC
  * table (the Annex-K sequential tables define no EOBn symbols);
  * [[decode]] accumulates coefficients across scans (first + refine
  * paths per T.81 G.1.2, per-scan DHT redefinition, marker
  * realignment) and transforms once at the end — pixels IDENTICAL to
  * the baseline stream of the same coefficients, for both scripts.
  *
  * Scope boundary (loud, never silent): progressive + subsampling,
  * progressive + DRI, inconsistent Ah (not 0 and not Al+1), 16-bit
  * quant tables, and sampling factors other than
  * 4:4:4 / 4:2:0 / 4:2:2 throw `IllegalArgumentException` — decoding
  * those as garbage pixels would poison dedup silently.
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

  // Annex K.4 / K.6: standard chrominance DC and AC huffman tables
  private val DcBitsC = Array(0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcValsC = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  private val AcBitsC = Array(0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcValsC: Array[Int] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
    0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
    0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
    0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
    0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
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
  private lazy val dcEncC = buildEncodeTable(DcBitsC, DcValsC)
  private lazy val acEncC = buildEncodeTable(AcBitsC, AcValsC)

  // Progressive AC scans emit EOBn symbols (T.81 G.1.2.2) that the
  // sequential Annex-K tables do not define: a flat 8-bit code over
  // every symbol a spectral-selection encoder can produce (EOB0–EOB14,
  // ZRL, run 0–15 × size 1–10 = 176 symbols, Kraft 176/256 < 1) —
  // deliberately simple, deterministic, and self-describing via its
  // DHT segment like any table (the decoder reads whatever the stream
  // declares; real encoders ship optimized tables the same way).
  private lazy val ProgAcVals: Array[Int] = {
    val eobs = (0 to 14).map(_ << 4)
    val zrl = Seq(0xf0)
    val rs = for (r <- 0 to 15; s <- 1 to 10) yield (r << 4) | s
    (eobs ++ zrl ++ rs).toArray
  }
  private lazy val ProgAcBits: Array[Int] = {
    val b = new Array[Int](17); b(8) = ProgAcVals.length; b
  }
  private lazy val progAcEnc = buildEncodeTable(ProgAcBits, ProgAcVals)

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

  /** Level-shifted 8×8 block from `plane` (pw×ph) at (x0, y0), edge
    * replicated.
    */
  private def loadBlock(plane: Array[Int], pw: Int, ph: Int,
      x0: Int, y0: Int, blk: Array[Double]): Unit = {
    var y = 0
    while (y < 8) {
      val sy = math.min(y0 + y, ph - 1)
      var x = 0
      while (x < 8) {
        val sx = math.min(x0 + x, pw - 1)
        blk(y * 8 + x) = plane(sy * pw + sx) - 128.0
        x += 1
      }
      y += 1
    }
  }

  /** Forward DCT + quantize (q = 1 → plain round). */
  private def fdctQuant(blk: Array[Double], coef: Array[Int]): Unit = {
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
  }

  /** Entropy-code one quantized block in zigzag order; returns the new
    * DC predictor.
    */
  private def writeBlock(coef: Array[Int], dcPred: Int,
      dcT: Array[(Int, Int)], acT: Array[(Int, Int)],
      bw: BitWriter): Int = {
    val dc = coef(0)
    val diff = dc - dcPred
    val s = category(diff)
    val (dcode, dlen) = dcT(s)
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
          val (zc, zl) = acT(0xf0); bw.put(zc, zl); run -= 16
        }
        val ss = category(ac)
        val (c, l) = acT((run << 4) | ss)
        bw.put(c, l)
        bw.put(if (ac >= 0) ac else ac + (1 << ss) - 1, ss)
        run = 0
      }
      k += 1
    }
    if (run > 0) { val (c, l) = acT(0x00); bw.put(c, l) } // EOB
    dc
  }

  /** Encode the image's LUMA as a baseline grayscale JPEG with an
    * all-ones quant table (maximum quality). Luma is the classic
    * integer approximation `(77r + 150g + 29b + 128) >> 8` — exactly v
    * for gray pixels (r=g=b=v). `restartInterval` > 0 writes a DRI
    * segment and an RSTn marker every that-many MCUs (DC predictors
    * reset); 0 keeps the stream byte-identical to the pre-DRI codec.
    */
  def encode(img: Bmp.Image, restartInterval: Int = 0): Array[Byte] = {
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
    if (restartInterval > 0) { // DRI before SOS
      marker(0xdd); u16(4); u16(restartInterval)
    }
    marker(0xda); u16(8); out.write(1) // SOS, 1 comp
    out.write(1); out.write(0x00) // comp 1 uses DC0/AC0
    out.write(0); out.write(63); out.write(0) // Ss, Se, AhAl
    val bw = new BitWriter(out)
    val bw8 = (w + 7) / 8
    val bh8 = (h + 7) / 8
    val totalMcus = bw8 * bh8
    val coef = new Array[Int](64)
    val blk = new Array[Double](64)
    var dcPred = 0
    var mcu = 0
    var rst = 0
    var by = 0
    while (by < bh8) {
      var bx = 0
      while (bx < bw8) {
        loadBlock(gray, w, h, bx * 8, by * 8, blk)
        fdctQuant(blk, coef)
        dcPred = writeBlock(coef, dcPred, dcEnc, acEnc, bw)
        mcu += 1
        if (restartInterval > 0 && mcu % restartInterval == 0 &&
            mcu < totalMcus) {
          bw.flush() // pad to byte per spec, then the restart marker
          marker(0xd0 + rst)
          rst = (rst + 1) % 8
          dcPred = 0 // predictors reset at every restart (§E.2.4)
        }
        bx += 1
      }
      by += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Encode as a baseline 3-component YCbCr JPEG (JFIF integer color
    * transform), all-ones quant tables, Annex-K luma tables for Y and
    * chroma tables for Cb/Cr. `subsample = false` → 4:4:4 (every
    * component 1×1); `subsample = true` → 4:2:0 (Y 2×2, chroma
    * box-averaged over 2×2 pixel groups) — the two sampling layouts
    * that dominate real corpora. `restartInterval` as in [[encode]]
    * (an MCU here is the full interleaved Y/Cb/Cr group).
    */
  def encodeColor(img: Bmp.Image, subsample: Boolean,
      restartInterval: Int = 0): Array[Byte] =
    if (subsample) encodeColorSampled(img, 2, 2, restartInterval)
    else encodeColorSampled(img, 1, 1, restartInterval)

  /** 4:2:2 (Y 2×1, chroma box-averaged over horizontal pixel pairs) —
    * the common camera/scanner setting: horizontal-only chroma
    * decimation. Same stream structure as [[encodeColor]] with luma
    * sampling factor 2×1.
    */
  def encodeColor422(img: Bmp.Image,
      restartInterval: Int = 0): Array[Byte] =
    encodeColorSampled(img, 2, 1, restartInterval)

  /** 4:1:1 (Y 4×1, chroma box-averaged over horizontal quads) — the
    * DV/camcorder layout; the last common horizontal decimation the
    * SOF gate used to refuse. Same stream structure, luma factor 4×1.
    */
  def encodeColor411(img: Bmp.Image,
      restartInterval: Int = 0): Array[Byte] =
    encodeColorSampled(img, 4, 1, restartInterval)

  /** 4:4:0 (Y 1×2, chroma box-averaged over vertical pixel pairs) —
    * the vertical-only decimation (rotated-scan hardware); closes the
    * loud 1×2 gate together with [[encodeColor411]].
    */
  def encodeColor440(img: Bmp.Image,
      restartInterval: Int = 0): Array[Byte] =
    encodeColorSampled(img, 1, 2, restartInterval)

  /** Shared color-encode core at luma sampling `hs`×`vs` (chroma is
    * always 1×1): 1×1 = 4:4:4, 2×2 = 4:2:0, 2×1 = 4:2:2. The chroma
    * planes box-average hs×vs pixel groups (edge replicated, round
    * half up — (sum + n/2) / n reproduces the 4:2:0 (sum+2)>>2
    * exactly).
    */
  private def encodeColorSampled(img: Bmp.Image, hs: Int, vs: Int,
      restartInterval: Int): Array[Byte] = {
    val w = img.width; val h = img.height
    require(w > 0 && h > 0, "positive dimensions")
    val subsample = hs * vs > 1
    val yP = new Array[Int](w * h)
    val cbP = new Array[Int](w * h)
    val crP = new Array[Int](w * h)
    var i = 0
    while (i < w * h) {
      val r = img.rgb(3 * i) & 0xff
      val g = img.rgb(3 * i + 1) & 0xff
      val b = img.rgb(3 * i + 2) & 0xff
      yP(i) = (77 * r + 150 * g + 29 * b + 128) >> 8
      cbP(i) = math.max(0, math.min(255,
        ((-43 * r - 85 * g + 128 * b + 128) >> 8) + 128))
      crP(i) = math.max(0, math.min(255,
        ((128 * r - 107 * g - 21 * b + 128) >> 8) + 128))
      i += 1
    }
    // chroma planes at their sampled resolution
    val (cw, ch) =
      if (subsample) ((w + hs - 1) / hs, (h + vs - 1) / vs) else (w, h)
    val (cb2, cr2) =
      if (!subsample) (cbP, crP)
      else {
        val b2 = new Array[Int](cw * ch)
        val r2 = new Array[Int](cw * ch)
        val n = hs * vs
        var cy = 0
        while (cy < ch) {
          var cx = 0
          while (cx < cw) {
            // hs×vs box average, edge replicated, round half up
            var sb = 0; var sr = 0
            var dy = 0
            while (dy < vs) {
              val yy = math.min(cy * vs + dy, h - 1)
              var dx = 0
              while (dx < hs) {
                val xx = math.min(cx * hs + dx, w - 1)
                sb += cbP(yy * w + xx); sr += crP(yy * w + xx)
                dx += 1
              }
              dy += 1
            }
            b2(cy * cw + cx) = (sb + n / 2) / n
            r2(cy * cw + cx) = (sr + n / 2) / n
            cx += 1
          }
          cy += 1
        }
        (b2, r2)
      }
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def u16(v: Int): Unit = { out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
    marker(0xd8) // SOI
    // DQT: 8-bit tables 0 (luma) and 1 (chroma), both all-ones
    marker(0xdb); u16(2 + 2 * 65)
    for (tq <- 0 to 1) {
      out.write(tq)
      var z = 0
      while (z < 64) { out.write(1); z += 1 }
    }
    marker(0xc0); u16(8 + 3 * 3) // SOF0, 3 components
    out.write(8); u16(h); u16(w); out.write(3)
    out.write(1); out.write((hs << 4) | vs); out.write(0)
    out.write(2); out.write(0x11); out.write(1)
    out.write(3); out.write(0x11); out.write(1)
    def dht(cls: Int, id: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); u16(2 + 1 + 16 + vals.length)
      out.write((cls << 4) | id)
      var l = 1
      while (l <= 16) { out.write(bits(l)); l += 1 }
      vals.foreach(out.write)
    }
    dht(0, 0, DcBits, DcVals); dht(1, 0, AcBits, AcVals)
    dht(0, 1, DcBitsC, DcValsC); dht(1, 1, AcBitsC, AcValsC)
    if (restartInterval > 0) { // DRI before SOS
      marker(0xdd); u16(4); u16(restartInterval)
    }
    marker(0xda); u16(6 + 2 * 3); out.write(3) // SOS, 3 comps
    out.write(1); out.write(0x00) // Y uses DC0/AC0
    out.write(2); out.write(0x11) // Cb uses DC1/AC1
    out.write(3); out.write(0x11)
    out.write(0); out.write(63); out.write(0) // Ss, Se, AhAl
    val bw = new BitWriter(out)
    val coef = new Array[Int](64)
    val blk = new Array[Double](64)
    val mcusX = (w + 8 * hs - 1) / (8 * hs)
    val mcusY = (h + 8 * vs - 1) / (8 * vs)
    var dcY = 0; var dcCb = 0; var dcCr = 0
    var mcu = 0
    var rst = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        // Y blocks: hs×vs, left-to-right then top-to-bottom
        var byy = 0
        while (byy < vs) {
          var bxx = 0
          while (bxx < hs) {
            loadBlock(yP, w, h, (mx * hs + bxx) * 8,
              (my * vs + byy) * 8, blk)
            fdctQuant(blk, coef)
            dcY = writeBlock(coef, dcY, dcEnc, acEnc, bw)
            bxx += 1
          }
          byy += 1
        }
        loadBlock(cb2, cw, ch, mx * 8, my * 8, blk)
        fdctQuant(blk, coef)
        dcCb = writeBlock(coef, dcCb, dcEncC, acEncC, bw)
        loadBlock(cr2, cw, ch, mx * 8, my * 8, blk)
        fdctQuant(blk, coef)
        dcCr = writeBlock(coef, dcCr, dcEncC, acEncC, bw)
        mcu += 1
        if (restartInterval > 0 && mcu % restartInterval == 0 &&
            mcu < mcusX * mcusY) {
          bw.flush()
          marker(0xd0 + rst)
          rst = (rst + 1) % 8
          dcY = 0; dcCb = 0; dcCr = 0 // all predictors reset (§E.2.4)
        }
        mx += 1
      }
      my += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Quantized (all-ones) coefficient blocks of a plane, raster order:
    * the shared front half of the baseline and progressive encoders.
    */
  private def quantBlocks(plane: Array[Int], w: Int,
      h: Int): Array[Array[Int]] = {
    val bw8 = (w + 7) / 8
    val bh8 = (h + 7) / 8
    val out = new Array[Array[Int]](bw8 * bh8)
    val blk = new Array[Double](64)
    var by = 0
    while (by < bh8) {
      var bx = 0
      while (bx < bw8) {
        val coef = new Array[Int](64)
        loadBlock(plane, w, h, bx * 8, by * 8, blk)
        fdctQuant(blk, coef)
        out(by * bw8 + bx) = coef
        bx += 1
      }
      by += 1
    }
    out
  }

  /** A FIRST AC scan (T.81 G.1.2.2): spectral band `ss..se` at point
    * transform `al` (coded values are the SIGN-MAGNITUDE truncation
    * `sign(v)·(|v| >> al)`; `al = 0` is the pure spectral-selection
    * case) — in-band run-length with ZRL, EOB RUNS (EOBn symbols)
    * accumulated across all-zero-band blocks.
    */
  private def writeAcScan(blocks: Array[Array[Int]], ss: Int, se: Int,
      al: Int, acT: Array[(Int, Int)], bw: BitWriter): Unit = {
    var eobrun = 0
    def flushEob(): Unit = if (eobrun > 0) {
      val n = 31 - java.lang.Integer.numberOfLeadingZeros(eobrun)
      val (c, l) = acT(n << 4)
      bw.put(c, l)
      if (n > 0) bw.put(eobrun - (1 << n), n)
      eobrun = 0
    }
    def tval(coef: Array[Int], k: Int): Int = {
      val v = coef(ZigZag(k))
      val t = math.abs(v) >> al
      if (v < 0) -t else t
    }
    var b = 0
    while (b < blocks.length) {
      val coef = blocks(b)
      var last = se
      while (last >= ss && tval(coef, last) == 0) last -= 1
      if (last < ss) {
        eobrun += 1
        if (eobrun == 0x7fff) flushEob()
      } else {
        flushEob()
        var run = 0
        var k = ss
        while (k <= last) {
          val v = tval(coef, k)
          if (v == 0) run += 1
          else {
            while (run >= 16) {
              val (zc, zl) = acT(0xf0); bw.put(zc, zl); run -= 16
            }
            val sz = category(v)
            val (c, l) = acT((run << 4) | sz)
            bw.put(c, l)
            bw.put(if (v >= 0) v else v + (1 << sz) - 1, sz)
            run = 0
          }
          k += 1
        }
        if (last < se) eobrun += 1 // this block's tail is an EOB
      }
      b += 1
    }
    flushEob()
  }

  /** A REFINEMENT AC scan (T.81 G.1.2.3, Ah = al+1 → Al = al): one
    * more magnitude bit per already-nonzero coefficient (correction
    * bits, buffered and emitted after the next symbol), newly-visible
    * coefficients (`|v| >> al == 1`) as (run,1)+sign, EOB runs with
    * their buffered corrections — the libjpeg encode_mcu_AC_refine
    * shape.
    */
  private def writeAcRefine(blocks: Array[Array[Int]], ss: Int, se: Int,
      al: Int, acT: Array[(Int, Int)], bw: BitWriter): Unit = {
    var eobrun = 0
    val eobBits = new scala.collection.mutable.ArrayBuffer[Int]()
    def flushEob(): Unit = {
      if (eobrun > 0) {
        val n = 31 - java.lang.Integer.numberOfLeadingZeros(eobrun)
        val (c, l) = acT(n << 4)
        bw.put(c, l)
        if (n > 0) bw.put(eobrun - (1 << n), n)
        eobrun = 0
      }
      eobBits.foreach(bit => bw.put(bit, 1))
      eobBits.clear()
    }
    var b = 0
    while (b < blocks.length) {
      val coef = blocks(b)
      val temp = new Array[Int](64)
      var eobPos = ss - 1 // last newly-visible position
      var k0 = ss
      while (k0 <= se) {
        temp(k0) = math.abs(coef(ZigZag(k0))) >> al
        if (temp(k0) == 1) eobPos = k0
        k0 += 1
      }
      val br = new scala.collection.mutable.ArrayBuffer[Int]()
      var r = 0
      var k = ss
      while (k <= se) {
        val t = temp(k)
        if (t == 0) r += 1
        else {
          // drain pending ZRLs at EVERY nonzero coefficient (libjpeg
          // encode_mcu_AC_refine): the decoder consumes correction
          // bits positionally per 16-zero-history span, so a t>1
          // coefficient past the first 16 zeros of a run must see its
          // ZRLs emitted BEFORE its correction bit is buffered —
          // buffering first would splice that bit after a ZRL whose
          // span the decoder walks without reading it (stream desync).
          // Runs past the last newly-visible position fold into EOB.
          while (r > 15 && k <= eobPos) {
            flushEob()
            val (zc, zl) = acT(0xf0); bw.put(zc, zl); r -= 16
            br.foreach(bit => bw.put(bit, 1)); br.clear()
          }
          if (t > 1) br += (t & 1) // correction bit, buffered
          else {
            flushEob()
            val (c, l) = acT((r << 4) | 1)
            bw.put(c, l)
            bw.put(if (coef(ZigZag(k)) < 0) 0 else 1, 1)
            br.foreach(bit => bw.put(bit, 1)); br.clear()
            r = 0
          }
        }
        k += 1
      }
      if (r > 0 || br.nonEmpty) {
        eobrun += 1
        eobBits ++= br
        if (eobrun == 0x7fff) flushEob()
      }
      b += 1
    }
    flushEob()
  }

  /** PROGRESSIVE (SOF2) encode, SPECTRAL SELECTION only (Ah=Al=0
    * throughout — successive approximation stays out of scope on both
    * sides): one interleaved DC scan, then per-component AC bands
    * 1–5 and 6–63 — the classic coarse-to-fine script. Same quantized
    * coefficients as [[encode]]/[[encodeColor]] 4:4:4, so the decoded
    * pixels are IDENTICAL to the baseline stream's. `color = false` →
    * grayscale; `color = true` → 3-component YCbCr 4:4:4 (progressive
    * + subsampling stays out of scope).
    */
  def encodeProgressive(img: Bmp.Image, color: Boolean,
      sa: Boolean = false): Array[Byte] = {
    val w = img.width; val h = img.height
    require(w > 0 && h > 0, "positive dimensions")
    val nComp = if (color) 3 else 1
    val planes = new Array[Array[Int]](nComp)
    val yP = new Array[Int](w * h)
    val cbP = if (color) new Array[Int](w * h) else null
    val crP = if (color) new Array[Int](w * h) else null
    var i = 0
    while (i < w * h) {
      val r = img.rgb(3 * i) & 0xff
      val g = img.rgb(3 * i + 1) & 0xff
      val b = img.rgb(3 * i + 2) & 0xff
      yP(i) = (77 * r + 150 * g + 29 * b + 128) >> 8
      if (color) {
        cbP(i) = math.max(0, math.min(255,
          ((-43 * r - 85 * g + 128 * b + 128) >> 8) + 128))
        crP(i) = math.max(0, math.min(255,
          ((128 * r - 107 * g - 21 * b + 128) >> 8) + 128))
      }
      i += 1
    }
    planes(0) = yP
    if (color) { planes(1) = cbP; planes(2) = crP }
    val blocks = planes.map(quantBlocks(_, w, h))
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def u16(v: Int): Unit = { out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
    marker(0xd8) // SOI
    marker(0xdb); u16(2 + (if (color) 2 else 1) * 65)
    for (tq <- 0 until (if (color) 2 else 1)) {
      out.write(tq)
      var z = 0
      while (z < 64) { out.write(1); z += 1 }
    }
    marker(0xc2); u16(8 + 3 * nComp) // SOF2: progressive DCT
    out.write(8); u16(h); u16(w); out.write(nComp)
    out.write(1); out.write(0x11); out.write(0)
    if (color) {
      out.write(2); out.write(0x11); out.write(1)
      out.write(3); out.write(0x11); out.write(1)
    }
    def dht(cls: Int, id: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); u16(2 + 1 + 16 + vals.length)
      out.write((cls << 4) | id)
      var l = 1
      while (l <= 16) { out.write(bits(l)); l += 1 }
      vals.foreach(out.write)
    }
    dht(0, 0, DcBits, DcVals); dht(1, 0, ProgAcBits, ProgAcVals)
    if (color) {
      dht(0, 1, DcBitsC, DcValsC)
      dht(1, 1, ProgAcBits, ProgAcVals)
    }
    def sos(comps: Seq[(Int, Int)], ss: Int, se: Int, ah: Int,
        al: Int): Unit = {
      marker(0xda); u16(6 + 2 * comps.length); out.write(comps.length)
      comps.foreach { case (id, tt) => out.write(id); out.write(tt) }
      out.write(ss); out.write(se); out.write((ah << 4) | al)
    }
    val nBlocks = blocks(0).length
    // FIRST DC scan, all components interleaved (MCU = 1 block each);
    // with successive approximation the coded diffs are the ARITHMETIC
    // shift dc >> al (two's complement — OR-refinable, T.81 G.1.2.1)
    def dcFirst(al: Int): Unit = {
      sos((1 to nComp).map(c =>
        (c, (if (c == 1) 0 else 1) << 4)), 0, 0, 0, al)
      val bw1 = new BitWriter(out)
      val dcPred = new Array[Int](nComp)
      var b = 0
      while (b < nBlocks) {
        var c = 0
        while (c < nComp) {
          val dcT = if (c == 0) dcEnc else dcEncC
          val dc = blocks(c)(b)(0) >> al
          val diff = dc - dcPred(c)
          dcPred(c) = dc
          val s = category(diff)
          val (code, len) = dcT(s)
          bw1.put(code, len)
          if (s > 0)
            bw1.put(if (diff >= 0) diff else diff + (1 << s) - 1, s)
          c += 1
        }
        b += 1
      }
      bw1.flush()
    }
    // DC refinement: one bit per block per component
    def dcRefine(al: Int): Unit = {
      sos((1 to nComp).map(c => (c, 0)), 0, 0, al + 1, al)
      val bw1 = new BitWriter(out)
      var b = 0
      while (b < nBlocks) {
        var c = 0
        while (c < nComp) {
          bw1.put((blocks(c)(b)(0) >> al) & 1, 1)
          c += 1
        }
        b += 1
      }
      bw1.flush()
    }
    // AC scans are single-component (T.81 G.1.1.1)
    def acScan(c: Int, ss: Int, se: Int, ah: Int, al: Int): Unit = {
      sos(Seq((c + 1, if (c == 0) 0x00 else 0x11)), ss, se, ah, al)
      val bwA = new BitWriter(out)
      if (ah == 0) writeAcScan(blocks(c), ss, se, al, progAcEnc, bwA)
      else writeAcRefine(blocks(c), ss, se, al, progAcEnc, bwA)
      bwA.flush()
    }
    if (!sa) {
      // spectral selection only: DC, then per-component bands
      dcFirst(0)
      var c = 0
      while (c < nComp) {
        acScan(c, 1, 5, 0, 0); acScan(c, 6, 63, 0, 0)
        c += 1
      }
    } else {
      // the classic libjpeg-style successive-approximation script:
      // coarse first scans, then refinement passes down to full
      // precision
      dcFirst(1)
      var c = 0
      while (c < nComp) {
        acScan(c, 1, 5, 0, 2); acScan(c, 6, 63, 0, 2)
        c += 1
      }
      c = 0
      while (c < nComp) { acScan(c, 1, 63, 2, 1); c += 1 }
      dcRefine(0)
      c = 0
      while (c < nComp) { acScan(c, 1, 63, 1, 0); c += 1 }
    }
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
              "past the scan, or an RSTn off its interval boundary)")
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
    /** Discard padding bits and advance to the next marker (0xFF
      * followed by non-zero) — the end-of-scan realignment the
      * progressive multi-scan loop needs. Only padding (possibly a
      * stuffed 0xFF00 pair) may precede the marker.
      */
    def alignToMarker(): Int = {
      nbits = 0
      while (pos + 1 < data.length &&
        !((data(pos) & 0xff) == 0xff && (data(pos + 1) & 0xff) != 0))
        pos += 1
      pos
    }
    /** Consume the RSTn marker at an interval boundary: discard the
      * padding bits of the partial byte, skip at most the one padding
      * byte (possibly 0xFF + its stuffed 0x00) the encoder's flush can
      * leave unread, verify the 0–7 modulo sequence (T.81 §E.2.4).
      * A bounded scan — anything but padding-then-RSTn is loud.
      */
    def restart(expected: Int): Unit = {
      nbits = 0 // padding bits are framing, per spec
      var skipped = 0
      while (skipped <= 2 && !(pos + 1 < data.length &&
          (data(pos) & 0xff) == 0xff && {
            val m = data(pos + 1) & 0xff; m >= 0xd0 && m <= 0xd7
          })) { pos += 1; skipped += 1 }
      require(pos + 1 < data.length && skipped <= 2,
        "restart marker not found at interval boundary")
      val m = (data(pos + 1) & 0xff) - 0xd0
      require(m == expected,
        s"restart marker out of sequence: expected RST$expected, got RST$m")
      pos += 2
    }
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** One entropy-coded block: huffman-decode, dequantize into `coef`;
    * returns the new DC predictor.
    */
  private def readBlock(br: BitReader, dcT: DecodeTable,
      acT: DecodeTable, quant: Array[Int], dcPred0: Int,
      coef: Array[Int]): Int = {
    java.util.Arrays.fill(coef, 0)
    val s = br.decodeSym(dcT)
    val dcPred = dcPred0 + extend(br.bits(s), s)
    coef(0) = dcPred * quant(0)
    var k = 1
    var eob = false
    while (k < 64 && !eob) {
      val rs = br.decodeSym(acT)
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
    dcPred
  }

  /** Inverse DCT of one dequantized block into `plane` (pw×ph) at
    * (x0, y0) — planes are whole-block sized, no bounds clipping.
    */
  private def idctToPlane(coef: Array[Int], plane: Array[Int],
      pw: Int, x0: Int, y0: Int): Unit = {
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
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
        plane((y0 + y) * pw + (x0 + x)) = math.max(0, math.min(255,
          math.round(0.25 * acc + 128.0).toInt))
        x += 1
      }
      y += 1
    }
  }

  /** Decode a baseline JPEG — grayscale (1 component) or YCbCr color
    * (3 components, 4:4:4 or 4:2:0) — to a [[Bmp.Image]] (gray input
    * → r=g=b). Loud on anything outside the supported scope.
    */
  def decode(payload: Array[Byte]): Bmp.Image = {
    require(payload.length >= 4 && (payload(0) & 0xff) == 0xff &&
      (payload(1) & 0xff) == 0xd8, "not a JPEG (missing SOI)")
    var pos = 2
    def u16(at: Int): Int =
      ((payload(at) & 0xff) << 8) | (payload(at + 1) & 0xff)
    val qtab = new Array[Array[Int]](4)
    val dcTabs = new Array[DecodeTable](4)
    val acTabs = new Array[DecodeTable](4)
    var w = 0; var h = 0
    var nComp = 0
    val compId = new Array[Int](3)
    val compH = new Array[Int](3)
    val compV = new Array[Int](3)
    val compTq = new Array[Int](3)
    val compTd = new Array[Int](3)
    val compTa = new Array[Int](3)
    var restartInterval = 0
    var progressive = false
    var sosAt = -1
    // DHT segment parse, shared by the header loop and the
    // progressive between-scans marker loop (tables MAY redefine
    // between scans, T.81 B.2.4.2)
    def parseDht(at0: Int, end: Int): Unit = {
      var at = at0
      while (at < end) {
        val cls = (payload(at) & 0xff) >> 4
        val th = payload(at) & 0x0f
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
        if (cls == 0) dcTabs(th) = t else acTabs(th) = t
        at += 17 + total
      }
    }
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
            qtab(tq) = t
            at += 65
          }
        case 0xc0 | 0xc2 =>
          progressive = m == 0xc2
          require((payload(body) & 0xff) == 8, "only 8-bit precision")
          h = u16(body + 1); w = u16(body + 3)
          nComp = payload(body + 5) & 0xff
          require(nComp == 1 || nComp == 3,
            s"only grayscale or 3-component YCbCr in codec scope; got $nComp")
          var c = 0
          while (c < nComp) {
            compId(c) = payload(body + 6 + 3 * c) & 0xff
            val hv = payload(body + 7 + 3 * c) & 0xff
            compH(c) = hv >> 4; compV(c) = hv & 0x0f
            compTq(c) = payload(body + 8 + 3 * c) & 0xff
            require(compTq(c) < 4, s"quant table id ${compTq(c)} out of range")
            c += 1
          }
          if (progressive) {
            var ci = 0
            while (ci < nComp) {
              require(compH(ci) == 1 && compV(ci) == 1,
                "progressive + subsampling out of codec scope")
              ci += 1
            }
          } else if (nComp == 1)
            require(compH(0) == 1 && compV(0) == 1, "only 1x1 sampling")
          else {
            require((compH(0) == 1 && compV(0) == 1) ||
              (compH(0) == 2 && compV(0) == 2) ||
              (compH(0) == 2 && compV(0) == 1) ||
              (compH(0) == 4 && compV(0) == 1) ||
              (compH(0) == 1 && compV(0) == 2),
              s"only 4:4:4, 4:2:0, 4:2:2, 4:1:1, or 4:4:0 sampling " +
                s"in codec scope (the MCU loop and per-component " +
                s"nearest upsample are generic; other hxv layouts " +
                s"stay loud); luma ${compH(0)}x${compV(0)}")
            require(compH(1) == 1 && compV(1) == 1 &&
              compH(2) == 1 && compV(2) == 1,
              "chroma components must be 1x1")
          }
        case 0xc4 => parseDht(body, pos + 2 + len)
        case 0xdd =>
          require(len == 4, s"malformed DRI segment length $len")
          restartInterval = u16(body)
        case 0xda =>
          if (!progressive) {
            val ns = payload(body) & 0xff
            require(ns == nComp, s"scan components $ns != frame $nComp " +
              "(multi-scan out of sequential codec scope)")
            var k = 0
            while (k < ns) {
              val id = payload(body + 1 + 2 * k) & 0xff
              val tt = payload(body + 2 + 2 * k) & 0xff
              val idx = compId.indexOf(id)
              require(idx >= 0 && idx < nComp, s"SOS names unknown component $id")
              compTd(idx) = tt >> 4; compTa(idx) = tt & 0x0f
              require(compTd(idx) < 4 && compTa(idx) < 4,
                s"huffman table id out of range for component $id")
              k += 1
            }
          }
          sosAt = body
        case _ => // APPn, COM, others: skip
      }
      if (sosAt < 0) pos = pos + 2 + len
    }
    require(w > 0 && h > 0, "missing SOF marker before SOS")
    if (!progressive) {
      var c0 = 0
      while (c0 < nComp) {
        require(qtab(compTq(c0)) != null, s"missing quant table ${compTq(c0)}")
        require(dcTabs(compTd(c0)) != null && acTabs(compTa(c0)) != null,
          s"missing huffman tables for component ${compId(c0)}")
        c0 += 1
      }
    }
    var maxH = 1; var maxV = 1
    var c1 = 0
    while (c1 < nComp) {
      maxH = math.max(maxH, compH(c1)); maxV = math.max(maxV, compV(c1))
      c1 += 1
    }
    val mcusX = (w + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (h + 8 * maxV - 1) / (8 * maxV)
    val planeW = new Array[Int](nComp)
    val planeH = new Array[Int](nComp)
    val planes = new Array[Array[Int]](nComp)
    val dcPred = new Array[Int](nComp)
    var c2 = 0
    while (c2 < nComp) {
      planeW(c2) = mcusX * compH(c2) * 8
      planeH(c2) = mcusY * compV(c2) * 8
      planes(c2) = new Array[Int](planeW(c2) * planeH(c2))
      c2 += 1
    }
    if (!progressive) {
      val br = new BitReader(payload, sosAt + 1 + 2 * nComp + 3)
      val coef = new Array[Int](64)
      var mcu = 0
      var rstExpected = 0
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          if (restartInterval > 0 && mcu > 0 &&
              mcu % restartInterval == 0) {
            br.restart(rstExpected)
            rstExpected = (rstExpected + 1) % 8
            java.util.Arrays.fill(dcPred, 0) // §F.2.1.3.1
          }
          var c = 0
          while (c < nComp) {
            var byy = 0
            while (byy < compV(c)) {
              var bxx = 0
              while (bxx < compH(c)) {
                dcPred(c) = readBlock(br, dcTabs(compTd(c)),
                  acTabs(compTa(c)), qtab(compTq(c)), dcPred(c), coef)
                idctToPlane(coef, planes(c), planeW(c),
                  (mx * compH(c) + bxx) * 8, (my * compV(c) + byy) * 8)
                bxx += 1
              }
              byy += 1
            }
            c += 1
          }
          mcu += 1
          mx += 1
        }
        my += 1
      }
    } else {
      // PROGRESSIVE (SOF2), spectral selection only: coefficients
      // accumulate across scans (all components 1x1, so every
      // component shares the mcusX x mcusY block grid); dequantize +
      // IDCT once at the end. Successive approximation (Ah/Al != 0)
      // and DRI inside progressive scans are loud.
      val nB = mcusX * mcusY
      val coefs = Array.fill(nComp)(new Array[Int](nB * 64))
      // decode ONE scan whose SOS body starts at `body`; returns the
      // position of the next marker
      def decodeScan(body: Int): Int = {
        val ns = payload(body) & 0xff
        require(ns >= 1 && ns <= nComp, s"bad scan component count $ns")
        val scanComp = new Array[Int](ns)
        var k = 0
        while (k < ns) {
          val id = payload(body + 1 + 2 * k) & 0xff
          val tt = payload(body + 2 + 2 * k) & 0xff
          val idx = compId.indexOf(id)
          require(idx >= 0 && idx < nComp,
            s"SOS names unknown component $id")
          compTd(idx) = tt >> 4; compTa(idx) = tt & 0x0f
          scanComp(k) = idx
          k += 1
        }
        val ss = payload(body + 1 + 2 * ns) & 0xff
        val se = payload(body + 2 + 2 * ns) & 0xff
        val a = payload(body + 3 + 2 * ns) & 0xff
        val ah = a >> 4
        val al = a & 0x0f
        require(ah == 0 || ah == al + 1,
          s"successive-approximation Ah=$ah must be 0 or Al+1 (Al=$al)")
        require(restartInterval == 0,
          "DRI inside progressive scans out of codec scope")
        val br = new BitReader(payload, body + 4 + 2 * ns)
        if (ss == 0) {
          require(se == 0, "a DC scan must have Se = 0 (T.81 G.1.1.1)")
          if (ah == 0) {
            // FIRST DC scan: diffs of (dc >> al), stored << al
            scanComp.foreach { ci =>
              require(dcTabs(compTd(ci)) != null,
                s"missing DC table for component ${compId(ci)}")
              dcPred(ci) = 0 // predictors reset at scan start
            }
            var b = 0
            while (b < nB) {
              var i = 0
              while (i < ns) {
                val ci = scanComp(i)
                val s = br.decodeSym(dcTabs(compTd(ci)))
                dcPred(ci) += extend(br.bits(s), s)
                coefs(ci)(b * 64) = dcPred(ci) << al
                i += 1
              }
              b += 1
            }
          } else {
            // DC REFINEMENT: one magnitude bit per block/component,
            // OR-ed into the two's-complement value (T.81 G.1.2.1)
            var b = 0
            while (b < nB) {
              var i = 0
              while (i < ns) {
                val ci = scanComp(i)
                if (br.bits(1) == 1)
                  coefs(ci)(b * 64) |= (1 << al)
                i += 1
              }
              b += 1
            }
          }
        } else {
          require(ns == 1,
            "a progressive AC scan must be single-component (T.81 G.1.1.1)")
          require(ss <= se && se <= 63, s"bad spectral band $ss..$se")
          val ci = scanComp(0)
          val acT = acTabs(compTa(ci))
          require(acT != null,
            s"missing AC table for component ${compId(ci)}")
          val cf = coefs(ci)
          var eobrun = 0
          if (ah == 0) {
            // FIRST AC scan at point transform al (values stored << al)
            var b = 0
            while (b < nB) {
              if (eobrun > 0) eobrun -= 1
              else {
                var k2 = ss
                var stop = false
                while (k2 <= se && !stop) {
                  val rs = br.decodeSym(acT)
                  val r = rs >> 4
                  val sz = rs & 0x0f
                  if (sz == 0) {
                    if (r < 15) { // EOBn: this + the next 2^r-1+bits blocks
                      eobrun = (1 << r) - 1 +
                        (if (r > 0) br.bits(r) else 0)
                      stop = true
                    } else k2 += 16 // ZRL
                  } else {
                    k2 += r
                    require(k2 <= se, "AC run overflows the spectral band")
                    cf(b * 64 + ZigZag(k2)) = extend(br.bits(sz), sz) << al
                    k2 += 1
                  }
                }
              }
              b += 1
            }
          } else {
            // AC REFINEMENT (T.81 G.1.2.3, the libjpeg
            // decode_mcu_AC_refine shape): correction bits for
            // already-nonzero coefficients — read even inside EOB
            // runs — newly-visible coefficients as (run,1)+sign
            val p1 = 1 << al
            val m1 = -(1 << al)
            def correct(idx: Int): Unit =
              if (br.bits(1) == 1 && (cf(idx) & p1) == 0)
                cf(idx) += (if (cf(idx) >= 0) p1 else m1)
            var b = 0
            while (b < nB) {
              var k2 = ss
              if (eobrun == 0) {
                var stop = false
                while (k2 <= se && !stop) {
                  val rs = br.decodeSym(acT)
                  val r0 = rs >> 4
                  val sz = rs & 0x0f
                  require(sz <= 1,
                    "refinement AC size field must be 0 or 1")
                  var newVal = 0
                  var r = r0
                  if (sz == 0) {
                    if (r0 < 15) {
                      eobrun = (1 << r0) +
                        (if (r0 > 0) br.bits(r0) else 0)
                      stop = true
                    }
                    // r0 == 15: ZRL — pass 16 zero-history positions
                  } else {
                    newVal = if (br.bits(1) == 1) p1 else m1
                  }
                  if (!stop) {
                    // advance over the run: corrections on nonzeros,
                    // the run counts zero-history positions only
                    var placed = false
                    while (k2 <= se && !placed) {
                      val idx = b * 64 + ZigZag(k2)
                      if (cf(idx) != 0) { correct(idx); k2 += 1 }
                      else {
                        r -= 1
                        if (r < 0) {
                          if (sz == 1) { cf(idx) = newVal }
                          placed = true
                          k2 += 1
                        } else k2 += 1
                      }
                    }
                    require(sz == 0 || placed,
                      "refinement run overflows the spectral band")
                  }
                }
              }
              if (eobrun > 0) {
                // the remainder of this block (and whole later blocks
                // while the run lasts) only refines existing nonzeros
                while (k2 <= se) {
                  val idx = b * 64 + ZigZag(k2)
                  if (cf(idx) != 0) correct(idx)
                  k2 += 1
                }
                eobrun -= 1
              }
              b += 1
            }
          }
        }
        br.alignToMarker()
      }
      var p = decodeScan(sosAt)
      var finished = false
      while (!finished) {
        require(p + 1 < payload.length,
          "progressive stream truncated before EOI")
        require((payload(p) & 0xff) == 0xff, "marker desync between scans")
        val m2 = payload(p + 1) & 0xff
        m2 match {
          case 0xd9 => finished = true
          case 0xc4 =>
            val len2 = u16(p + 2)
            parseDht(p + 4, p + 2 + len2)
            p = p + 2 + len2
          case 0xda => p = decodeScan(p + 4)
          case 0xdd => throw new IllegalArgumentException(
            "DRI between progressive scans out of codec scope")
          case _ => p = p + 2 + u16(p + 2) // APPn/COM
        }
      }
      // dequantize + inverse-transform the accumulated coefficients
      val tmp = new Array[Int](64)
      var c = 0
      while (c < nComp) {
        val q = qtab(compTq(c))
        require(q != null, s"missing quant table ${compTq(c)}")
        var b = 0
        while (b < nB) {
          var k = 0
          while (k < 64) {
            val nat = ZigZag(k)
            tmp(nat) = coefs(c)(b * 64 + nat) * q(k)
            k += 1
          }
          idctToPlane(tmp, planes(c), planeW(c),
            (b % mcusX) * 8, (b / mcusX) * 8)
          b += 1
        }
        c += 1
      }
    }
    val rgb = new Array[Byte](w * h * 3)
    if (nComp == 1) {
      var py = 0
      while (py < h) {
        var px = 0
        while (px < w) {
          val v = planes(0)(py * planeW(0) + px).toByte
          val p = (py * w + px) * 3
          rgb(p) = v; rgb(p + 1) = v; rgb(p + 2) = v
          px += 1
        }
        py += 1
      }
    } else {
      def clamp(v: Int): Byte =
        math.max(0, math.min(255, v)).toByte
      var py = 0
      while (py < h) {
        var px = 0
        while (px < w) {
          // per-component nearest sample at its sampled resolution
          def sample(c: Int): Int =
            planes(c)((py * compV(c) / maxV) * planeW(c) +
              (px * compH(c) / maxH))
          val y = sample(0)
          val cb = sample(1) - 128
          val cr = sample(2) - 128
          val p = (py * w + px) * 3
          rgb(p) = clamp(y + ((359 * cr + 128) >> 8))
          rgb(p + 1) = clamp(y - ((88 * cb + 183 * cr + 128) >> 8))
          rgb(p + 2) = clamp(y + ((454 * cb + 128) >> 8))
          px += 1
        }
        py += 1
      }
    }
    Bmp.Image(w, h, rgb)
  }
}
