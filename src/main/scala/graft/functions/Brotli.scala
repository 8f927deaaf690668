package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Brotli (RFC 7932) codec as native codegen expressions — the
  * `Content-Encoding: br` entity-body layer. `br` is ubiquitous on the
  * real web; a crawl ingest that dies loudly on it sheds a large
  * corpus fraction (the round-18 scope guard this replaces).
  *
  * The DECODER ([[Brotli.inflate]]) is a full from-scratch
  * implementation of the RFC 7932 bit format: stream header,
  * uncompressed/metadata/compressed meta-blocks, simple and complex
  * prefix codes (incl. the 16/17 repeat coding), block-type switching
  * with block-count codes, literal context modeling (all four context
  * modes over the Appendix-D lookup table), context maps with RLE +
  * inverse-MTF, insert&copy command decoding, the distance ring
  * buffer with short codes, direct and postfix distances, and static
  * dictionary references with all 121 word transforms (Appendices A/B
  * — the dictionary blob and the context LUT ship as resources;
  * dictionary SHA-256
  * 20e42eb1b511c21806d4d227d07e5dd06877d8ce7b3a817f378f313653f35c70).
  * It was differential-tested against the reference libbrotli decoder
  * over randomized corpora at every quality 0–11 and window 10–24
  * (committed real-encoder vectors replay in BrotliSpec). Malformed
  * input THROWS with the bit offset — loud, never guessed; a decode
  * is bounded by `MaxOutput` so a hostile stream cannot balloon an
  * executor (brotli's framing allows ~4 GiB from a handful of bytes).
  *
  * The ENCODER side is fixture-grade but VALID RFC 7932 output any
  * conformant decoder accepts (verified against libbrotli):
  * [[Brotli.deflateStored]] frames the payload in uncompressed
  * meta-blocks; [[Brotli.deflateLiteral]] emits one compressed
  * meta-block per chunk with a flat 8-bit complex literal code and a
  * single-symbol insert&copy code (exercising the compressed decode
  * path end-to-end in oracle-checked queries). Nothing cross-engine
  * compares compressed bytes — oracles replay from pre-compression
  * truth (the [[Gzip]] contract).
  */
object Brotli {

  /** Decode-size ceiling (64 MiB): a corrupt or hostile stream must
    * not balloon an executor; real crawl bodies sit far below.
    */
  val MaxOutput: Int = 1 << 26

  // ---------------------------------------------------------------
  // RFC 7932 constant tables
  // ---------------------------------------------------------------

  // dictionary words per length: log2 word counts (Appendix A)
  private val DictSizeBits = Array(0, 0, 0, 0, 10, 10, 11, 11, 10, 10,
    10, 10, 10, 9, 9, 8, 7, 7, 8, 7, 7, 6, 6, 5, 5)
  private val DictOffset = Array(0, 0, 0, 0, 0, 4096, 9216, 21504,
    35840, 44032, 53248, 63488, 74752, 87040, 93696, 100864, 104704,
    106752, 108928, 113536, 115968, 118528, 119872, 121280, 122016,
    122784)

  // block count code (symbol -> base, extra bits)
  private val BlockCountOff = Array(1, 5, 9, 13, 17, 25, 33, 41, 49,
    65, 81, 97, 113, 145, 177, 209, 241, 305, 369, 497, 753, 1265,
    2289, 4337, 8433, 16625)
  private val BlockCountBits = Array(2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4,
    4, 5, 5, 5, 5, 6, 6, 7, 8, 9, 10, 11, 12, 13, 24)

  // insert / copy length codes (symbol -> base, extra bits)
  private[functions] val InsOff = Array(0, 1, 2, 3, 4, 5, 6, 8, 10,
    14, 18, 26, 34, 50, 66, 98, 130, 194, 322, 578, 1090, 2114, 6210,
    22594)
  private[functions] val InsBits = Array(0, 0, 0, 0, 0, 0, 1, 1, 2, 2,
    3, 3, 4, 4, 5, 5, 6, 7, 8, 9, 10, 12, 14, 24)
  private val CpOff = Array(2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 14, 18,
    22, 30, 38, 54, 70, 102, 134, 198, 326, 582, 1094, 2118)
  private val CpBits = Array(0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3,
    4, 4, 5, 5, 6, 7, 8, 9, 10, 24)
  // insert&copy symbol cell -> (insert, copy) range high bits
  private val InsRangeLut = Array(0, 0, 8, 8, 0, 16, 8, 16, 16)
  private val CpRangeLut = Array(0, 8, 0, 8, 16, 0, 16, 8, 16)

  // complex-prefix-code symbol order + the fixed VLC over code-length
  // code lengths (symbols 0..5 have lengths {2,4,3,2,2,4})
  private val ClOrder = Array(1, 2, 3, 4, 0, 5, 17, 6, 16, 7, 8, 9,
    10, 11, 12, 13, 14, 15)
  private val ClCodeLengths = Array(2, 4, 3, 2, 2, 4)

  // the 121 dictionary-word transforms (Appendix B): (prefix,
  // transform type, suffix); types: 0 identity, 1..9 omit-last-N,
  // 10 ferment-first, 11 ferment-all, 12..20 omit-first-(N-11)
  private val Transforms: Array[(String, Int, String)] = Array(
    ("", 0, ""), ("", 0, " "), (" ", 0, " "),
    ("", 12, ""), ("", 10, " "), ("", 0, " the "),
    (" ", 0, ""), ("s ", 0, " "), ("", 0, " of "),
    ("", 10, ""), ("", 0, " and "), ("", 13, ""),
    ("", 1, ""), (", ", 0, " "), ("", 0, ", "),
    (" ", 10, " "), ("", 0, " in "), ("", 0, " to "),
    ("e ", 0, " "), ("", 0, "\""), ("", 0, "."),
    ("", 0, "\">"), ("", 0, "\u000a"), ("", 3, ""),
    ("", 0, "]"), ("", 0, " for "), ("", 14, ""),
    ("", 2, ""), ("", 0, " a "), ("", 0, " that "),
    (" ", 10, ""), ("", 0, ". "), (".", 0, ""),
    (" ", 0, ", "), ("", 15, ""), ("", 0, " with "),
    ("", 0, "'"), ("", 0, " from "), ("", 0, " by "),
    ("", 16, ""), ("", 17, ""), (" the ", 0, ""),
    ("", 4, ""), ("", 0, ". The "), ("", 11, ""),
    ("", 0, " on "), ("", 0, " as "), ("", 0, " is "),
    ("", 7, ""), ("", 1, "ing "), ("", 0, "\u000a\u0009"),
    ("", 0, ":"), (" ", 0, ". "), ("", 0, "ed "),
    ("", 20, ""), ("", 18, ""), ("", 6, ""),
    ("", 0, "("), ("", 10, ", "), ("", 8, ""),
    ("", 0, " at "), ("", 0, "ly "), (" the ", 0, " of "),
    ("", 5, ""), ("", 9, ""), (" ", 10, ", "),
    ("", 10, "\""), (".", 0, "("), ("", 11, " "),
    ("", 10, "\">"), ("", 0, "=\""), (" ", 0, "."),
    (".com/", 0, ""), (" the ", 0, " of the "), ("", 10, "'"),
    ("", 0, ". This "), ("", 0, ","), (".", 0, " "),
    ("", 10, "("), ("", 10, "."), ("", 0, " not "),
    (" ", 0, "=\""), ("", 0, "er "), (" ", 11, " "),
    ("", 0, "al "), (" ", 11, ""), ("", 0, "='"),
    ("", 11, "\""), ("", 10, ". "), (" ", 0, "("),
    ("", 0, "ful "), (" ", 10, ". "), ("", 0, "ive "),
    ("", 0, "less "), ("", 11, "'"), ("", 0, "est "),
    (" ", 10, "."), ("", 11, "\">"), (" ", 0, "='"),
    ("", 10, ","), ("", 0, "ize "), ("", 11, "."),
    ("\u00c2\u00a0", 0, ""), (" ", 0, ","), ("", 10, "=\""),
    ("", 11, "=\""), ("", 0, "ous "), ("", 11, ", "),
    ("", 10, "='"), (" ", 10, ","), (" ", 11, "=\""),
    (" ", 11, ", "), ("", 11, ","), ("", 11, "("),
    ("", 11, ". "), (" ", 11, "."), ("", 11, "='"),
    (" ", 11, ". "), (" ", 10, "=\""), (" ", 11, "='"),
    (" ", 10, "='"))

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(name)
    require(in != null, s"missing resource $name")
    try in.readAllBytes() finally in.close()
  }

  /** RFC 7932 Appendix A static dictionary (122784 bytes). */
  private lazy val Dict: Array[Byte] = {
    val d = resource("/graft/brotli/dict.bin")
    require(d.length == 122784, s"brotli dictionary size ${d.length}")
    d
  }

  /** Appendix D context lookup table: 4 modes x (lut0[256] ++
    * lut1[256]); context = lut0(p1) | lut1(p2).
    */
  private lazy val CtxLut: Array[Byte] = {
    val d = resource("/graft/brotli/context_lut.bin")
    require(d.length == 2048, s"brotli context LUT size ${d.length}")
    d
  }

  // ---------------------------------------------------------------
  // bit reader
  // ---------------------------------------------------------------

  private final class BitReader(val d: Array[Byte]) {
    var pos: Long = 0L // bit position

    def bit(): Int = {
      val i = pos
      if ((i >> 3) >= d.length)
        throw new IllegalArgumentException(
          s"brotli: unexpected end of stream at bit $i")
      pos = i + 1
      (d((i >> 3).toInt) >> (i & 7).toInt) & 1
    }

    def bits(n: Int): Int = {
      var v = 0
      var k = 0
      while (k < n) { v |= bit() << k; k += 1 }
      v
    }

    def align(): Unit = pos = (pos + 7) & ~7L
  }

  // ---------------------------------------------------------------
  // canonical prefix codes
  // ---------------------------------------------------------------

  /** Canonical prefix-code decoder built from a length array: codes
    * are assigned shortest-first, ties by symbol value; decoding walks
    * the zlib-style (first, count, offset) arrays one bit at a time
    * (codes are at most 15 bits; per-symbol cost is bounded and the
    * alphabets are tiny, so no multi-level table is needed here).
    */
  private final class PrefixCode(lengths: Array[Int]) {
    private val MaxLen = 15
    val single: Int = {
      var s = -1; var n = 0; var i = 0
      while (i < lengths.length) {
        if (lengths(i) > 0) { n += 1; s = i }; i += 1
      }
      if (n == 1) s else -1
    }
    private val count = new Array[Int](MaxLen + 1)
    private val offset = new Array[Int](MaxLen + 1)
    private val syms: Array[Int] = if (single >= 0) null else {
      var i = 0
      while (i < lengths.length) {
        val l = lengths(i)
        if (l > 0) {
          if (l > MaxLen) throw new IllegalArgumentException(
            s"brotli: prefix code length $l")
          count(l) += 1
        }
        i += 1
      }
      var off = 0
      var l = 1
      while (l <= MaxLen) { offset(l) = off; off += count(l); l += 1 }
      val out = new Array[Int](off)
      val cursor = offset.clone()
      i = 0
      while (i < lengths.length) {
        val ln = lengths(i)
        if (ln > 0) { out(cursor(ln)) = i; cursor(ln) += 1 }
        i += 1
      }
      out
    }

    def read(br: BitReader): Int = {
      if (single >= 0) return single
      var code = 0
      var first = 0
      var index = 0
      var l = 1
      while (l <= MaxLen) {
        code = (code << 1) | br.bit()
        val c = count(l)
        if (code - first < c) return syms(index + code - first)
        index += c
        first = (first + c) << 1
        l += 1
      }
      throw new IllegalArgumentException(
        s"brotli: invalid prefix code at bit ${br.pos}")
    }
  }

  private def alphabetBits(alphabetSize: Int): Int =
    math.max(1, 32 - Integer.numberOfLeadingZeros(alphabetSize - 1))

  private def readPrefixCode(br: BitReader, alphabetSize: Int): PrefixCode = {
    val hskip = br.bits(2)
    if (hskip == 1) {
      // simple code: 1-4 explicit symbols; lengths by STREAM POSITION
      // ({1},{1,1},{1,2,2},{2,2,2,2} or {1,2,3,3}); canonical tie-break
      // within equal lengths is by symbol value (the builder sorts)
      val abits = alphabetBits(alphabetSize)
      val nsym = br.bits(2) + 1
      val syms = Array.fill(nsym)(br.bits(abits))
      syms.foreach(s => require(s < alphabetSize,
        s"brotli: simple-code symbol $s outside alphabet $alphabetSize"))
      require(syms.distinct.length == nsym,
        "brotli: duplicate symbol in simple prefix code")
      val lengths = new Array[Int](alphabetSize)
      nsym match {
        case 1 => lengths(syms(0)) = 1
        case 2 => lengths(syms(0)) = 1; lengths(syms(1)) = 1
        case 3 =>
          lengths(syms(0)) = 1; lengths(syms(1)) = 2; lengths(syms(2)) = 2
        case _ =>
          if (br.bit() == 1) { // tree-select: depth-3 variant
            lengths(syms(0)) = 1; lengths(syms(1)) = 2
            lengths(syms(2)) = 3; lengths(syms(3)) = 3
          } else {
            var i = 0; while (i < 4) { lengths(syms(i)) = 2; i += 1 }
          }
      }
      new PrefixCode(lengths)
    } else {
      // complex code: code-length code lengths in ClOrder (skipping
      // hskip), read with the fixed VLC, until the code-length code
      // is complete; then symbol lengths with 16/17 repeat coding
      val clVlc = new PrefixCode(ClCodeLengths)
      val clLens = new Array[Int](18)
      var space = 32
      var numCodes = 0
      var i = hskip
      while (i < 18 && space > 0) {
        val sym = ClOrder(i)
        val v = clVlc.read(br)
        clLens(sym) = v
        if (v != 0) { space -= 32 >> v; numCodes += 1 }
        i += 1
      }
      if (numCodes == 1) {
        val s = clLens.indexWhere(_ > 0)
        require(s >= 1 && s <= 15,
          s"brotli: degenerate code-length code on symbol $s")
      }
      val clCode = new PrefixCode(clLens)
      val lengths = new Array[Int](alphabetSize)
      var symbol = 0
      var prevCodeLen = 8
      var repeat = 0
      var repeatCodeLen = 0
      var space2 = 32768
      while (symbol < alphabetSize && space2 > 0) {
        val cl = clCode.read(br)
        if (cl < 16) {
          lengths(symbol) = cl
          symbol += 1
          if (cl != 0) { prevCodeLen = cl; space2 -= 32768 >> cl }
          repeat = 0
        } else {
          val extraBits = if (cl == 16) 2 else 3
          val newLen = if (cl == 16) prevCodeLen else 0
          if (repeat == 0 || repeatCodeLen != newLen) {
            repeat = 0; repeatCodeLen = newLen
          }
          val old = repeat
          if (repeat > 0) repeat = (repeat - 2) << extraBits
          repeat += br.bits(extraBits) + 3
          val delta = repeat - old
          if (symbol + delta > alphabetSize)
            throw new IllegalArgumentException(
              "brotli: code-length repeat overflows the alphabet")
          var k = 0
          while (k < delta) {
            lengths(symbol) = repeatCodeLen; symbol += 1; k += 1
          }
          if (repeatCodeLen != 0) space2 -= delta << (15 - repeatCodeLen)
        }
      }
      new PrefixCode(lengths)
    }
  }

  private def readBlockCount(br: BitReader): Int =
    if (br.bit() == 0) 1
    else { val n = br.bits(3); 1 + (1 << n) + br.bits(n) }

  private def readBlockLen(br: BitReader, tree: PrefixCode): Int = {
    val sym = tree.read(br)
    BlockCountOff(sym) + br.bits(BlockCountBits(sym))
  }

  private def readContextMap(br: BitReader, numTrees: Int,
      size: Int): Array[Int] = {
    val cmap = new Array[Int](size)
    if (numTrees == 1) return cmap
    val rlemax = if (br.bit() == 1) br.bits(4) + 1 else 0
    val tree = readPrefixCode(br, numTrees + rlemax)
    var i = 0
    while (i < size) {
      val v = tree.read(br)
      if (v == 0) { cmap(i) = 0; i += 1 }
      else if (v <= rlemax) {
        var reps = (1 << v) + br.bits(v)
        while (reps > 0) {
          if (i >= size) throw new IllegalArgumentException(
            "brotli: context-map zero run overflows the map")
          cmap(i) = 0; i += 1; reps -= 1
        }
      } else { cmap(i) = v - rlemax; i += 1 }
    }
    if (br.bit() == 1) { // inverse move-to-front
      val mtf = Array.range(0, 256)
      var j = 0
      while (j < size) {
        val idx = cmap(j)
        val v = mtf(idx)
        cmap(j) = v
        var k = idx
        while (k > 0) { mtf(k) = mtf(k - 1); k -= 1 }
        mtf(0) = v
        j += 1
      }
    }
    cmap
  }

  // ferment (uppercase) step of dictionary transforms; returns the
  // number of bytes consumed (UTF-8-aware per the RFC)
  private def ferment(w: Array[Byte], i: Int): Int = {
    val c = w(i) & 0xff
    if (c < 192) {
      if (c >= 97 && c <= 122) w(i) = (c ^ 32).toByte
      1
    } else if (c < 224) {
      if (i + 1 < w.length) w(i + 1) = (w(i + 1) ^ 32).toByte
      2
    } else {
      if (i + 2 < w.length) w(i + 2) = (w(i + 2) ^ 5).toByte
      3
    }
  }

  private def transformWord(word: Array[Byte], tid: Int): Array[Byte] = {
    val (prefix, typ, suffix) = Transforms(tid)
    var w = word
    if (typ >= 1 && typ <= 9)            // omit last N
      w = java.util.Arrays.copyOfRange(w, 0, math.max(0, w.length - typ))
    else if (typ >= 12 && typ <= 20)     // omit first N
      w = java.util.Arrays.copyOfRange(w, math.min(w.length, typ - 11),
        w.length)
    else w = w.clone()
    if (typ == 10) { if (w.length > 0) ferment(w, 0) }
    else if (typ == 11) {
      var i = 0
      while (i < w.length) i += ferment(w, i)
    }
    val p = prefix.getBytes("ISO-8859-1")
    val s = suffix.getBytes("ISO-8859-1")
    val out = new Array[Byte](p.length + w.length + s.length)
    System.arraycopy(p, 0, out, 0, p.length)
    System.arraycopy(w, 0, out, p.length, w.length)
    System.arraycopy(s, 0, out, p.length + w.length, s.length)
    out
  }

  // growable output buffer
  private final class Out(hint: Int) {
    var buf = new Array[Byte](math.max(64, math.min(hint, 1 << 16)))
    var n = 0
    def ensure(extra: Int): Unit = {
      if (n + extra > MaxOutput)
        throw new IllegalArgumentException(
          s"brotli: output exceeds ${MaxOutput} bytes")
      if (n + extra > buf.length) {
        var cap = buf.length
        while (cap < n + extra) cap <<= 1
        buf = java.util.Arrays.copyOf(buf, math.min(cap, MaxOutput))
      }
    }
    def add(b: Byte): Unit = { ensure(1); buf(n) = b; n += 1 }
    def addAll(bs: Array[Byte], off: Int, len: Int): Unit = {
      ensure(len); System.arraycopy(bs, off, buf, n, len); n += len
    }
    def result(): Array[Byte] = java.util.Arrays.copyOf(buf, n)
  }

  // ---------------------------------------------------------------
  // decoder
  // ---------------------------------------------------------------

  /** Decode a complete brotli stream; throws IllegalArgumentException
    * (with the offending bit offset where known) on any malformed
    * input, and on outputs beyond [[MaxOutput]].
    */
  def inflate(data: Array[Byte]): Array[Byte] = {
    val br = new BitReader(data)
    val wbits =
      if (br.bit() == 0) 16
      else {
        val n = br.bits(3)
        if (n != 0) 17 + n
        else {
          val m = br.bits(3)
          if (m == 0) 17
          else if (m == 1) throw new IllegalArgumentException(
            "brotli: reserved window code")
          else 8 + m
        }
      }
    val win = (1 << wbits) - 16
    val out = new Out(data.length * 4)
    // distance ring buffer, most recent first (initial last = 4)
    val rb = Array(4, 11, 15, 16)

    var last = false
    while (!last) {
      last = br.bit() == 1
      var skipBlock = false
      if (last && br.bit() == 1) skipBlock = true // ISLASTEMPTY
      if (!skipBlock) {
        val mnibbles = br.bits(2)
        if (mnibbles == 3) {
          // metadata meta-block: skip its bytes
          if (last) throw new IllegalArgumentException(
            "brotli: metadata block in the last position")
          if (br.bit() != 0) throw new IllegalArgumentException(
            "brotli: reserved metadata bit set")
          val mskipbytes = br.bits(2)
          var mskip = 0
          if (mskipbytes > 0) {
            mskip = br.bits(8 * mskipbytes)
            if (mskipbytes > 1 && (mskip >>> (8 * (mskipbytes - 1))) == 0)
              throw new IllegalArgumentException(
                "brotli: non-minimal metadata length")
            mskip += 1
          }
          br.align()
          br.pos += 8L * mskip
          if ((br.pos >> 3) > data.length)
            throw new IllegalArgumentException(
              "brotli: metadata skip past end of stream")
        } else {
          val mlen = br.bits(16 + 4 * mnibbles) + 1
          if (mnibbles > 0 && (mlen - 1) < (1 << (12 + 4 * mnibbles)))
            throw new IllegalArgumentException(
              "brotli: non-minimal MNIBBLES")
          var uncompressed = false
          if (!last) uncompressed = br.bit() == 1
          if (uncompressed) {
            br.align()
            val p = (br.pos >> 3).toInt
            if (p + mlen > data.length)
              throw new IllegalArgumentException(
                "brotli: uncompressed block past end of stream")
            out.addAll(data, p, mlen)
            br.pos += 8L * mlen
          } else {
            decodeCompressedBlock(br, mlen, win, out, rb)
          }
        }
      }
    }
    out.result()
  }

  private def decodeCompressedBlock(br: BitReader, mlen: Int, win: Int,
      out: Out, rb: Array[Int]): Unit = {
    val nbl = new Array[Int](3)
    val btype = new Array[Int](3)
    val btypePrev = Array(1, 1, 1)
    val blen = Array(1 << 28, 1 << 28, 1 << 28)
    val btypeTrees = new Array[PrefixCode](3)
    val blenTrees = new Array[PrefixCode](3)
    var j = 0
    while (j < 3) {
      nbl(j) = readBlockCount(br)
      if (nbl(j) >= 2) {
        btypeTrees(j) = readPrefixCode(br, nbl(j) + 2)
        blenTrees(j) = readPrefixCode(br, 26)
        blen(j) = readBlockLen(br, blenTrees(j))
      }
      j += 1
    }
    val npostfix = br.bits(2)
    val ndirect = br.bits(4) << npostfix
    val cmode = Array.fill(nbl(0))(br.bits(2))
    val ntreesl = readBlockCount(br)
    val cmapl = readContextMap(br, ntreesl, 64 * nbl(0))
    val ntreesd = readBlockCount(br)
    val cmapd = readContextMap(br, ntreesd, 4 * nbl(2))
    val htreel = Array.fill(ntreesl)(readPrefixCode(br, 256))
    val htreei = Array.fill(nbl(1))(readPrefixCode(br, 704))
    val distAlpha = 16 + ndirect + (48 << npostfix)
    val htreed = Array.fill(ntreesd)(readPrefixCode(br, distAlpha))

    def switchBlock(k: Int): Unit = {
      val sym = btypeTrees(k).read(br)
      val nt =
        if (sym == 0) btypePrev(k)
        else if (sym == 1) (btype(k) + 1) % nbl(k)
        else sym - 2
      btypePrev(k) = btype(k)
      btype(k) = nt
      blen(k) = readBlockLen(br, blenTrees(k))
    }

    var produced = 0
    while (produced < mlen) {
      if (blen(1) == 0) switchBlock(1)
      blen(1) -= 1
      val sym = htreei(btype(1)).read(br)
      var rangeIdx = sym >> 6
      val distImplicit = rangeIdx < 2
      if (!distImplicit) rangeIdx -= 2
      val insCode = InsRangeLut(rangeIdx) + ((sym >> 3) & 7)
      val cpCode = CpRangeLut(rangeIdx) + (sym & 7)
      val ilen = InsOff(insCode) + br.bits(InsBits(insCode))
      val clen = CpOff(cpCode) + br.bits(CpBits(cpCode))
      // literals
      var k = 0
      while (k < ilen) {
        if (blen(0) == 0) switchBlock(0)
        blen(0) -= 1
        val p1 = if (out.n >= 1) out.buf(out.n - 1) & 0xff else 0
        val p2 = if (out.n >= 2) out.buf(out.n - 2) & 0xff else 0
        val mode = cmode(btype(0))
        val ctx = (CtxLut((mode << 9) + p1) & 0xff) |
          (CtxLut((mode << 9) + 256 + p2) & 0xff)
        val tree = htreel(cmapl((btype(0) << 6) + ctx))
        out.add(tree.read(br).toByte)
        k += 1
      }
      produced += ilen
      if (produced < mlen) {
        val maxDist = math.min(win, out.n)
        var dist = 0
        if (distImplicit) dist = rb(0)
        else {
          if (blen(2) == 0) switchBlock(2)
          blen(2) -= 1
          val dctx = math.min(clen - 2, 3)
          val dtree = htreed(cmapd((btype(2) << 2) + dctx))
          val dsym = dtree.read(br)
          var push = true
          if (dsym < 16) {
            if (dsym == 0) { dist = rb(0); push = false }
            else if (dsym < 4) dist = rb(dsym)
            else {
              val base = if (dsym < 10) rb(0) else rb(1)
              val kk = if (dsym < 10) dsym - 4 else dsym - 10
              val delta = (kk >> 1) + 1
              dist = if ((kk & 1) == 1) base + delta else base - delta
              if (dist <= 0) throw new IllegalArgumentException(
                s"brotli: non-positive short-code distance at bit ${br.pos}")
            }
          } else if (dsym < 16 + ndirect) {
            dist = dsym - 16 + 1
          } else {
            val x = dsym - ndirect - 16
            val hcode = x >>> npostfix
            val lcode = x & ((1 << npostfix) - 1)
            val ndistbits = 1 + (hcode >> 1)
            val extra = br.bits(ndistbits)
            val offset = ((2 + (hcode & 1)) << ndistbits) - 4
            dist = ((offset + extra) << npostfix) + lcode + ndirect + 1
          }
          if (push && dist <= maxDist) {
            rb(3) = rb(2); rb(2) = rb(1); rb(1) = rb(0); rb(0) = dist
          }
        }
        if (dist <= maxDist) {
          // backward copy, possibly overlapping
          out.ensure(clen)
          var c = 0
          while (c < clen) {
            out.buf(out.n) = out.buf(out.n - dist); out.n += 1; c += 1
          }
          produced += clen
        } else {
          // static dictionary reference
          if (clen < 4 || clen > 24)
            throw new IllegalArgumentException(
              s"brotli: dictionary word length $clen at bit ${br.pos}")
          val wordId = dist - maxDist - 1
          val shift = DictSizeBits(clen)
          val idx = wordId & ((1 << shift) - 1)
          val tid = wordId >>> shift
          if (tid >= 121)
            throw new IllegalArgumentException(
              s"brotli: dictionary transform $tid at bit ${br.pos}")
          val base = DictOffset(clen) + idx * clen
          val w = transformWord(
            java.util.Arrays.copyOfRange(Dict, base, base + clen), tid)
          out.addAll(w, 0, w.length)
          produced += w.length
        }
      }
    }
  }

  // ---------------------------------------------------------------
  // fixture encoders (valid RFC 7932 output; libbrotli-verified)
  // ---------------------------------------------------------------

  private final class BitWriter {
    private var buf = new Array[Byte](64)
    private var bitPos = 0
    private def ensure(bits: Int): Unit = {
      val need = (bitPos + bits + 7) >> 3
      if (need > buf.length)
        buf = java.util.Arrays.copyOf(buf, math.max(need, buf.length * 2))
    }
    def w(v: Int, n: Int): Unit = { // LSB-first
      ensure(n)
      var k = 0
      while (k < n) {
        if (((v >> k) & 1) == 1)
          buf(bitPos >> 3) = (buf(bitPos >> 3) | (1 << (bitPos & 7))).toByte
        bitPos += 1
        k += 1
      }
    }
    def code(v: Int, n: Int): Unit = { // prefix-code bits, MSB-first
      ensure(n)
      var k = n - 1
      while (k >= 0) {
        if (((v >> k) & 1) == 1)
          buf(bitPos >> 3) = (buf(bitPos >> 3) | (1 << (bitPos & 7))).toByte
        bitPos += 1
        k -= 1
      }
    }
    def align(): Unit = bitPos = (bitPos + 7) & ~7
    def bytes(bs: Array[Byte], off: Int, len: Int): Unit = {
      align(); ensure(8 * len)
      System.arraycopy(bs, off, buf, bitPos >> 3, len)
      bitPos += 8 * len
    }
    def result(): Array[Byte] = {
      align(); java.util.Arrays.copyOf(buf, bitPos >> 3)
    }
  }

  private def writeHeader(bw: BitWriter): Unit = { bw.w(1, 1); bw.w(5, 3) } // WBITS 22

  private def writeMlen(bw: BitWriter, n: Int): Unit =
    if (n - 1 < (1 << 16)) { bw.w(0, 2); bw.w(n - 1, 16) }
    else if (n - 1 < (1 << 20)) { bw.w(1, 2); bw.w(n - 1, 20) }
    else { bw.w(2, 2); bw.w(n - 1, 24) }

  /** Frame `data` in UNCOMPRESSED meta-blocks (plus the closing empty
    * last block) — the simplest valid brotli stream for a payload.
    */
  def deflateStored(data: Array[Byte]): Array[Byte] = {
    val bw = new BitWriter
    writeHeader(bw)
    var i = 0
    while (i < data.length) {
      val n = math.min(1 << 24, data.length - i)
      bw.w(0, 1) // ISLAST = 0
      writeMlen(bw, n)
      bw.w(1, 1) // ISUNCOMPRESSED
      bw.bytes(data, i, n)
      i += n
    }
    bw.w(1, 1); bw.w(1, 1) // ISLAST, ISLASTEMPTY
    bw.result()
  }

  // the fixed VLC over code-length-code lengths: value -> (code, bits)
  private val ClVlcEnc: Array[(Int, Int)] =
    Array((0, 2), (0xe, 4), (6, 3), (1, 2), (2, 2), (0xf, 4))

  /** One COMPRESSED meta-block per chunk: flat 8-bit complex literal
    * code, single-symbol insert&copy and distance codes, one
    * whole-chunk insert command — arbitrary payload bytes through the
    * compressed decode path (header parse, complex prefix code with
    * 16-repeats, trivial context, command loop). Not a compressor
    * (output is input + ~14 bytes); a VALID stream for any decoder.
    */
  def deflateLiteral(data: Array[Byte]): Array[Byte] = {
    val bw = new BitWriter
    writeHeader(bw)
    var i = 0
    while (i < data.length) {
      val n = math.min(1 << 22, data.length - i)
      bw.w(0, 1) // ISLAST = 0
      writeMlen(bw, n)
      bw.w(0, 1) // ISUNCOMPRESSED = 0
      bw.w(0, 1); bw.w(0, 1); bw.w(0, 1) // NBLTYPES L/I/D = 1
      bw.w(0, 2); bw.w(0, 4) // NPOSTFIX = 0, NDIRECT = 0
      bw.w(0, 2) // context mode LSB6
      bw.w(0, 1); bw.w(0, 1) // NTREESL = 1, NTREESD = 1
      // literal tree: complex, every symbol length 8. Code-length code
      // = {8 -> 1, 16 -> 1} (order fills 1,2,3,4,0,5,17,6 with zeros,
      // then 16, then 7 zero, then 8 — at which point the code-length
      // code is complete); symbol stream = one '8' then 16-repeats
      // 5/17/65/255 landing exactly on 256 symbols.
      bw.w(0, 2) // HSKIP = 0
      var k = 0
      while (k < 8) { val (c, b) = ClVlcEnc(0); bw.code(c, b); k += 1 }
      { val (c, b) = ClVlcEnc(1); bw.code(c, b) } // len(16) = 1
      { val (c, b) = ClVlcEnc(0); bw.code(c, b) } // len(7) = 0
      { val (c, b) = ClVlcEnc(1); bw.code(c, b) } // len(8) = 1
      bw.code(0, 1) // symbol '8' (code-length code: 8 -> 0, 16 -> 1)
      val extras = Array(2, 2, 2, 0)
      k = 0
      while (k < 4) { bw.code(1, 1); bw.w(extras(k), 2); k += 1 }
      // insert&copy tree: simple, one symbol encoding (insCode(n),
      // copy code 0); the command's copy half never executes because
      // the insert covers the whole meta-block
      var ic = 23
      while (InsOff(ic) > n) ic -= 1
      val cell = if (ic >= 16) 7 else if (ic >= 8) 4 else 0
      val sym = cell * 64 + ((ic & 7) << 3)
      bw.w(1, 2); bw.w(0, 2); bw.w(sym, 10)
      // distance tree: simple, one symbol (never read)
      bw.w(1, 2); bw.w(0, 2); bw.w(0, 6)
      // body: insert extra bits, then the literals (8 bits each,
      // MSB-first — the flat canonical code for symbol b is b)
      bw.w(n - InsOff(ic), InsBits(ic))
      var p = i
      while (p < i + n) { bw.code(data(p) & 0xff, 8); p += 1 }
      i += n
    }
    bw.w(1, 1); bw.w(1, 1) // ISLAST, ISLASTEMPTY
    bw.result()
  }
}

/** Brotli decode: NULL on NULL input; malformed data THROWS with a
  * bit offset — loud, never guessed (the Warc parse posture; a torn
  * body must fail its record visibly, not decode garbage).
  */
case class BrotliInflate(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "brotli_inflate"
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(a: Any): Any =
    Brotli.inflate(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.Brotli.inflate($c);
     """.stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): BrotliInflate = copy(child = newChild)
}

/** Fixture-side brotli framing ([[Brotli.deflateStored]] /
  * [[Brotli.deflateLiteral]]) — same codegen static-helper idiom as
  * [[GzipDeflate]].
  */
case class BrotliDeflate(child: Expression, literal: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "brotli_deflate"
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(a: Any): Any =
    if (literal) Brotli.deflateLiteral(a.asInstanceOf[Array[Byte]])
    else Brotli.deflateStored(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (literal) "deflateLiteral" else "deflateStored"
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.Brotli.$m($c);
     """.stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): BrotliDeflate = copy(child = newChild)
}

object BrotliCols {
  /** Column form of [[BrotliInflate]]. */
  def inflateCol(bytes: Column): Column =
    ColumnBridge.column(BrotliInflate(ColumnBridge.expression(bytes)))

  /** Column form of [[BrotliDeflate]] (fixture side). */
  def deflateCol(bytes: Column, literal: Boolean = false): Column =
    ColumnBridge.column(
      BrotliDeflate(ColumnBridge.expression(bytes), literal))
}
