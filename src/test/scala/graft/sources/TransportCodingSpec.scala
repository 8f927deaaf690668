package graft.sources

import graft.SparkSpec
import graft.functions.{Chunked, Gzip}
import org.apache.spark.sql.functions._

/** Round-16 transport layers: WHATWG windows-1252 decode + charset
  * alias normalization, and `Transfer-Encoding: chunked` framing.
  */
class TransportCodingSpec extends SparkSpec {
  import spark.implicits._

  test("windows-1252: 0x80-0x9F bytes decode per the WHATWG index") {
    // € ‚ ’ “ ” – — ™ plus an undefined-identity byte (0x81) and a
    // shared latin-1 byte (0xE9 é)
    val bytes = Array(0x80, 0x82, 0x91, 0x92, 0x93, 0x94, 0x96, 0x97,
      0x99, 0x81, 0xE9).map(_.toByte)
    val out = Seq(bytes).toDF("b")
      .select(Warc.decodeBody(col("b"), lit("iso-8859-1")).as("t"))
      .head().getString(0)
    assert(out == "€‚‘’“”–—" +
      "™é")
  }

  test("charset aliases all normalize; unknown labels pass through") {
    val labels = Seq("latin1", "l1", "ISO-8859-1", "cp1252",
      "Windows-1252", "us-ascii", "ASCII", "cp819")
    val n = labels.toDF("cs")
      .select(Warc.normalizeCharset(col("cs")).as("n"))
      .collect().map(_.getString(0)).toSet
    assert(n == Set("windows-1252"))
    val u = Seq("utf8", "UTF-8", "unicode-1-1-utf-8").toDF("cs")
      .select(Warc.normalizeCharset(col("cs")).as("n"))
      .collect().map(_.getString(0)).toSet
    assert(u == Set("utf-8"))
    val other = Seq("shift_jis").toDF("cs")
      .select(Warc.normalizeCharset(col("cs")).as("n"))
      .head().getString(0)
    assert(other == "shift_jis")
  }

  test("encodeCp1252 ∘ decodeBody roundtrips the cp1252 repertoire") {
    val txt = "curly ‘quotes’ and “double” — with € and … œŸž"
    val back = Seq(txt).toDF("t")
      .select(Warc.decodeBody(Warc.encodeCp1252(col("t")),
        lit("latin1")).as("r"))
      .head().getString(0)
    assert(back == txt)
  }

  test("utf-8-labeled bodies are untouched by the cp1252 branch") {
    val txt = "plain — “mixed” €"
    val back = Seq(txt).toDF("t")
      .select(Warc.decodeBody(encode(col("t"), "UTF-8"),
        lit("utf-8")).as("r"))
      .head().getString(0)
    assert(back == txt)
  }

  test("chunk encode/dechunk roundtrip at several sizes incl. binary") {
    val data = (0 until 300).map(_.toByte).toArray
    for (sz <- Seq(1, 7, 299, 300, 1000)) {
      val out = Chunked.dechunk(Chunked.encode(data, sz))
      assert(java.util.Arrays.equals(out, data), s"size $sz")
    }
    assert(Chunked.dechunk(Chunked.encode(Array.empty[Byte], 8)).isEmpty)
  }

  test("dechunk skips chunk extensions and trailer fields") {
    val framed = ("4;name=value\r\nwxyz\r\n" +
      "3\r\nabc\r\n" +
      "0\r\nX-Trailer: 1\r\nX-Other: 2\r\n\r\n").getBytes("US-ASCII")
    assert(new String(Chunked.dechunk(framed), "US-ASCII") == "wxyzabc")
  }

  test("deflate bodies: zlib and raw framings both inflate; corrupt " +
      "and empty are handled per contract") {
    val data = ("the quick brown fox " * 20).getBytes("UTF-8")
    assert(java.util.Arrays.equals(
      Gzip.inflateDeflate(Gzip.deflateZlib(data)), data))
    assert(java.util.Arrays.equals(
      Gzip.inflateDeflate(Gzip.deflateRaw(data)), data))
    assert(Gzip.inflateDeflate(Array.empty[Byte]) == null)
    intercept[IllegalArgumentException] {
      // 0x78 0x9C looks zlib but the stream is garbage; raw fallback
      // rejects it too -> loud
      Gzip.inflateDeflate(Array[Byte](0x78, 0x9C.toByte, 1, 2, 3))
    }
    // column-level roundtrip through the codegen expressions
    val out = Seq("été chunky body").toDF("t")
      .select(
        Gzip.inflateDeflateCol(Gzip.deflateZlibCol(encode(col("t"),
          "UTF-8"))).as("z"),
        Gzip.inflateDeflateCol(Gzip.deflateRawCol(encode(col("t"),
          "UTF-8"))).as("r"))
      .select(decode(col("z"), "UTF-8"), decode(col("r"), "UTF-8"))
      .head()
    assert(out.getString(0) == "été chunky body")
    assert(out.getString(1) == "été chunky body")
  }

  test("dechunk oversized chunk sizes stay inside the loud-IAE " +
      "contract (no NumberFormat/IndexOutOfBounds escape)") {
    // 9 hex digits: over the length cap
    val e1 = intercept[IllegalArgumentException] {
      Chunked.dechunk("FFFFFFFFF\r\nx\r\n0\r\n\r\n".getBytes("US-ASCII"))
    }
    assert(e1.getMessage.contains("bad chunk size"))
    // near-Int.MaxValue size: the old int arithmetic overflowed the
    // truncation guard negative and escaped as IndexOutOfBounds
    val e2 = intercept[IllegalArgumentException] {
      Chunked.dechunk("7FFFFFFF\r\nx\r\n0\r\n\r\n".getBytes("US-ASCII"))
    }
    assert(e2.getMessage.contains("truncated chunk"))
    // 8 digits over 2^31 as unsigned: still loud, still IAE
    val e3 = intercept[IllegalArgumentException] {
      Chunked.dechunk("FFFFFFFF\r\nx\r\n0\r\n\r\n".getBytes("US-ASCII"))
    }
    assert(e3.getMessage.contains("truncated chunk"))
  }

  test("a wrong-endian BOM under an explicit utf-16 label is NOT " +
      "silently consumed") {
    val txt = "abc"
    val mk = Seq(txt).toDF("t")
    // BE bytes with a BE BOM, but the label says LE: the BOM must not
    // be stripped as framing — the mismatch stays visible
    val r = mk.select(
      Warc.decodeBody(concat(unhex(lit("FEFF")),
        encode(col("t"), "UTF-16BE")), lit("utf-16le")).as("wrong"),
      Warc.decodeBody(concat(unhex(lit("FFFE")),
        encode(col("t"), "UTF-16LE")), lit("utf-16le")).as("right"))
      .head()
    assert(r.getString(1) == txt) // matching BOM strips as framing
    assert(r.getString(0) != txt) // mismatched BOM corrupts visibly
  }

  test("dechunk is loud on malformed framing") {
    intercept[IllegalArgumentException] {
      Chunked.dechunk("G\r\nxx\r\n0\r\n\r\n".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] { // truncated chunk
      Chunked.dechunk("10\r\nshort\r\n0\r\n\r\n".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] { // trailing garbage
      Chunked.dechunk("1\r\na\r\n0\r\n\r\nextra".getBytes("US-ASCII"))
    }
  }

  test("BOM charsets sniff and decode; the BOM beats a lying header") {
    val txt = "caf— and ‘more’"
    val mk = Seq(txt).toDF("t")
    // UTF-8 BOM under a LYING latin-1 label
    val utf8Bom = mk.select(concat(unhex(lit("EFBBBF")),
      encode(col("t"), "UTF-8")).as("b"))
    val r1 = utf8Bom.select(Warc.bomCharset(col("b")).as("bom"),
      Warc.decodeBody(col("b"), Warc.bomCharset(col("b"))).as("d"),
      Warc.decodeBody(col("b"), lit("iso-8859-1")).as("lied")).head()
    assert(r1.getString(0) == "utf-8")
    assert(r1.getString(1) == txt)
    assert(r1.getString(2) != txt) // header-first would mojibake
    // UTF-16 both endiannesses, BOM stripped
    for ((bomHex, enc) <- Seq(("FFFE", "UTF-16LE"), ("FEFF", "UTF-16BE"))) {
      val df = mk.select(concat(unhex(lit(bomHex)),
        encode(col("t"), enc)).as("b"))
      val r = df.select(Warc.bomCharset(col("b")).as("bom"),
        Warc.decodeBody(col("b"), Warc.bomCharset(col("b"))).as("d"))
        .head()
      assert(r.getString(0) == enc.toLowerCase)
      assert(r.getString(1) == txt, enc)
    }
    // the bare WHATWG 'utf-16' label means little-endian, no BOM
    val le = mk.select(encode(col("t"), "UTF-16LE").as("b"))
      .select(Warc.decodeBody(col("b"), lit("utf-16")).as("d")).head()
    assert(le.getString(0) == txt)
    // odd byte count is lenient, not fatal
    val odd = Seq(Array[Byte](0x61, 0x00, 0x62)).toDF("b")
      .select(Warc.decodeBody(col("b"), lit("utf-16le")).as("d")).head()
    assert(odd.getString(0) == "a�")
  }

  test("decodeContentCoding: identity/gzip/deflate/br dispatch; any " +
      "unknown coding is LOUD — compressed bytes can never reach " +
      "the charset decode silently") {
    val txt = "entity body – exact bytes " * 8
    val rows = Seq(("", txt), ("identity", txt), ("gzip", txt),
      ("x-gzip", txt), ("deflate", txt), ("br", txt)).toDF("enc", "t")
    val got = rows.select(col("enc"),
        Warc.decodeContentCoding(
          when(col("enc").isin("gzip", "x-gzip"),
            Gzip.deflateCol(encode(col("t"), "UTF-8")))
            .when(col("enc") === "deflate",
              Gzip.deflateZlibCol(encode(col("t"), "UTF-8")))
            .when(col("enc") === "br",
              graft.functions.BrotliCols.deflateCol(
                encode(col("t"), "UTF-8"), literal = true))
            .otherwise(encode(col("t"), "UTF-8")),
          col("enc")).as("b"))
      .select(col("enc"), decode(col("b"), "UTF-8").as("back"))
      .collect()
    got.foreach(r => assert(r.getString(1) == txt, r.getString(0)))
    // zstd (and any other coding the layer does not implement) must
    // refuse, not pass the compressed bytes through
    val e = intercept[Exception] {
      Seq(("zstd", Array[Byte](0x28, (0xB5 - 256).toByte, 0x2F)))
        .toDF("enc", "b")
        .select(Warc.decodeContentCoding(col("b"), col("enc")))
        .collect()
    }
    def chain(t: Throwable): Iterator[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(16)
    assert(chain(e).exists(t => Option(t.getMessage)
      .exists(m => m.contains("unsupported Content-Encoding") &&
        m.contains("zstd"))))
  }

  test("the full onion: chunked + gzip + cp1252 through a payload") {
    val txt = "the caf’s — menu" * 10
    val raw = Seq(txt).toDF("t")
      .select(Warc.encodeCp1252(col("t")).as("b"))
      .select(Gzip.deflateCol(col("b")).as("b"))
      .select(Warc.httpResponseChunked(lit(200), lit("text/html"),
        lit("latin1"), lit("gzip"), col("b"), lit(11)).as("p"))
    val pt = Warc.payloadText(col("p"))
    val back = raw.select(
        Warc.httpTransferEncoding(pt).as("te"),
        Warc.httpContentEncoding(pt).as("ce"),
        Warc.decodeBody(
          Gzip.inflateCol(Chunked.dechunkCol(Warc.bodyBytes(col("p")))),
          Warc.httpCharset(pt)).as("r"))
      .head()
    assert(back.getString(0) == "chunked")
    assert(back.getString(1) == "gzip")
    assert(back.getString(2) == txt)
  }
}
