package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC-style crawl-container ingestion — the file format crawl dumps
  * actually arrive in (concatenated response records, each a header
  * block plus a Content-Length-delimited payload). The reader is the
  * codec-boundary pattern the image/audio formats follow
  * (reference scope: the staging feed `SCD_script.txt:83-116`,
  * generalized to the crawl container): whole segment files in via
  * Spark's `binaryFile` source, one strict per-file parse inside
  * `mapPartitions`, loud errors on malformed bytes — and everything
  * after the parse is ordinary relational work.
  *
  * Subset implemented (enforced loudly, never guessed): version line
  * `WARC/1.0`, `WARC-Target-URI` and `Content-Length` headers, CRLF
  * line ends, a blank line before the payload, and a CRLF CRLF record
  * separator. Real crawl segments are GiB-sized and SPLIT BY FILE —
  * parallelism is the segment count, each task streaming one file,
  * which is exactly how WARC is processed at scale (records cannot be
  * split safely without an index).
  */
object Warc {

  private val Crlf = "\r\n"

  private def recordBytes(uri: String, payload: Array[Byte])
      : Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val header = new StringBuilder()
      .append("WARC/1.0").append(Crlf)
      .append("WARC-Type: response").append(Crlf)
      .append("WARC-Target-URI: ").append(uri).append(Crlf)
      .append("Content-Length: ").append(payload.length).append(Crlf)
      .append(Crlf)
    out.write(header.toString.getBytes(UTF_8))
    out.write(payload)
    out.write((Crlf + Crlf).getBytes(UTF_8))
    out.toByteArray
  }

  /** Serialize records into one WARC segment. With `gzip = true` each
    * record becomes its OWN gzip member and the members concatenate —
    * the framing real crawl dumps use (per-record members keep records
    * independently decompressible; a multi-member-aware inflater reads
    * the whole segment as one stream).
    */
  def writeSegment(records: Iterator[(String, Array[Byte])],
      gzip: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.foreach { case (uri, payload) =>
      val rb = recordBytes(uri, payload)
      if (gzip) {
        val g = new java.util.zip.GZIPOutputStream(out)
        // close() ends the native Deflater eagerly (per-record members
        // would otherwise stack Deflaters until GC)
        try { g.write(rb); g.finish() } finally g.close()
      } else out.write(rb)
    }
    out.toByteArray
  }

  /** Inflate a gzipped segment across ALL its members (JDK
    * GZIPInputStream concatenates members transparently; corrupt
    * bytes throw — loud, never guessed).
    */
  private def gunzipAll(b: Array[Byte]): Array[Byte] =
    new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(b)).readAllBytes()

  /** Strict parse of one segment: `(uri, payload)` per record.
    * Gzipped segments self-identify by the 0x1F8B magic and inflate
    * first — readers need no out-of-band flag.
    */
  def parseSegment(bytes0: Array[Byte]): Seq[(String, Array[Byte])] = {
    val bytes =
      if (bytes0.length >= 2 && (bytes0(0) & 0xFF) == 0x1F &&
          (bytes0(1) & 0xFF) == 0x8B) gunzipAll(bytes0)
      else bytes0
    val out = Seq.newBuilder[(String, Array[Byte])]
    var i = 0
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"WARC parse at byte $i: $msg")
    def line(): String = {
      val start = i
      while (i + 1 < bytes.length &&
        !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
      if (i + 1 >= bytes.length) fail("unterminated header line")
      val s = new String(bytes, start, i - start, UTF_8)
      i += 2
      s
    }
    while (i < bytes.length) {
      val v = line()
      if (v != "WARC/1.0") fail(s"expected WARC/1.0, got '$v'")
      var uri: String = null
      var len: Long = -1L
      var h = line()
      while (h.nonEmpty) {
        val sep = h.indexOf(':')
        if (sep < 0) fail(s"malformed header '$h'")
        val (k, value) = (h.substring(0, sep).trim.toLowerCase,
          h.substring(sep + 1).trim)
        if (k == "warc-target-uri") uri = value
        if (k == "content-length") len = value.toLong
        h = line()
      }
      if (uri == null) fail("missing WARC-Target-URI")
      if (len < 0) fail("missing Content-Length")
      if (i + len + 4 > bytes.length) fail("payload past end of segment")
      val payload = java.util.Arrays.copyOfRange(bytes, i,
        i + len.toInt)
      i += len.toInt
      if (!(bytes(i) == '\r' && bytes(i + 1) == '\n' &&
          bytes(i + 2) == '\r' && bytes(i + 3) == '\n'))
        fail("missing record separator")
      i += 4
      out += ((uri, payload))
    }
    out.result()
  }

  /** Write a relation `(uriCol, payloadCol: string)` as WARC segment
    * files under `dir` — one segment per partition, written by the
    * task that owns it (how a distributed crawler lands segments).
    *
    * Segment names are the PARTITION ID (`segment-00042.warc`), and
    * each attempt stages to a hidden attempt-unique temp file before an
    * atomic REPLACE_EXISTING rename — so a retried or speculative task
    * attempt lands the SAME final name (last attempt wins) instead of a
    * second UUID-named copy of its partition, and readers never observe
    * a half-written segment (`binaryFile` ignores dotfiles).
    */
  def writeSegments(df: DataFrame, uriCol: String, payloadCol: String,
      dir: String, gzip: Boolean = false): Unit =
    landSegments(df.select(col(uriCol).cast("string"),
        col(payloadCol).cast("string")), dir, gzip,
      r => (r.getString(0), r.getString(1).getBytes(UTF_8)))

  /** Shared per-partition landing core of [[writeSegments]] /
    * [[writeSegmentsBinary]]: one segment per partition, staged to an
    * attempt-unique hidden temp file, atomic REPLACE_EXISTING rename.
    * NULL uris/payloads fail loudly WITH the offending record's
    * position — a silent NPE inside recordBytes names nothing.
    */
  private def landSegments(plan: DataFrame, dir: String, gzip: Boolean,
      rec: org.apache.spark.sql.Row => (String, Array[Byte])): Unit = {
    plan.foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        val recs = rows.zipWithIndex.map { case (r, k) =>
          if (r.isNullAt(0) || r.isNullAt(1))
            throw new IllegalArgumentException(
              s"WARC landing: NULL uri or payload at partition row $k" +
                s" (uri=${if (r.isNullAt(0)) "NULL" else r.getString(0)})")
          rec(r)
        }
        if (recs.hasNext) {
          val bytes = writeSegment(recs, gzip)
          val ctx = org.apache.spark.TaskContext.get()
          val pid = if (ctx == null) 0 else ctx.partitionId()
          val attempt = if (ctx == null) 0L else ctx.taskAttemptId()
          val tmp = java.nio.file.Paths.get(dir,
            f".segment-$pid%05d.warc.$attempt.tmp")
          java.nio.file.Files.write(tmp, bytes)
          java.nio.file.Files.move(tmp,
            java.nio.file.Paths.get(dir, f"segment-$pid%05d.warc"),
            java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
        ()
    }
  }

  /** Read every WARC segment under `dir`: `(uri, body)` with the
    * payload decoded as UTF-8 text. Parallelism = segment count.
    */
  def readRecords(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(dir)
      .select(col("content"))
      .as[Array[Byte]]
      .mapPartitions(_.flatMap(seg =>
        parseSegment(seg).map { case (u, p) => (u, new String(p, UTF_8)) }))
      .toDF("uri", "body")
  }

  /** [[writeSegments]] for BINARY payload columns — real HTTP bodies
    * are bytes (gzip members, non-UTF-8 charsets), and a text cast
    * would corrupt them. Same per-partition landing, same atomic
    * rename discipline.
    */
  def writeSegmentsBinary(df: DataFrame, uriCol: String,
      payloadCol: String, dir: String, gzip: Boolean = false): Unit =
    landSegments(df.select(col(uriCol).cast("string"),
        col(payloadCol).cast("binary")), dir, gzip,
      r => (r.getString(0), r.getAs[Array[Byte]](1)))

  /** [[readRecords]] with the payload kept as BYTES — the reader for
    * records whose entity body is not UTF-8 text (declared charsets,
    * `Content-Encoding: gzip`). Header work downstream goes through
    * [[payloadText]]'s lossless latin-1 view.
    */
  def readRecordsBinary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(dir)
      .select(col("content"))
      .as[Array[Byte]]
      .mapPartitions(_.flatMap(seg => parseSegment(seg)))
      .toDF("uri", "body")
  }

  import org.apache.spark.sql.Column

  /** An HTTP/1.1 response payload column — real WARC `response`
    * records carry the full HTTP message (status line + headers +
    * entity body), and every crawl pipeline's first relational step is
    * separating the transport metadata from the content. Pure column
    * work, so [[writeSegments]] lands it unchanged.
    */
  def httpResponse(status: Column, contentType: Column,
      body: Column): Column =
    // `.isin(n)` (an In, not an EqualTo) throughout the response
    // builders: fixture call sites pass LITERAL statuses, and
    // `lit(200) === 200` constructs Spark's "trivially true equals
    // predicate" WARN per row-batch — thousands of those lines flooded
    // the driver's stdout tail buffer in round 18 (BENCH_r18 parsed
    // null). Semantics are identical (single-element In == EqualTo,
    // incl. NULL behavior).
    concat(lit("HTTP/1.1 "), status.cast("string"), lit(" "),
      when(status.isin(200), lit("OK"))
        .when(status.isin(404), lit("Not Found"))
        .otherwise(lit("Status")),
      lit(Crlf), lit("Content-Type: "), contentType,
      lit(Crlf), lit(Crlf), body)

  /** Status code of an HTTP payload (NULL when the payload is not an
    * HTTP message — resource records pass through countable).
    */
  def httpStatus(payload: Column): Column = {
    val s = regexp_extract(payload, "^HTTP/1\\.[01] ([0-9]{3})", 1)
    when(s =!= "", s.cast("int"))
  }

  /** `Content-Type` header of an HTTP payload, '' when absent,
    * PARAMETERS STRIPPED — `text/html; charset=utf-8` returns the bare
    * media type `text/html`, so equality filters see what they expect.
    * The extract is anchored to the HEADER section (everything before
    * the first blank line) so a body that happens to contain the
    * header name cannot forge it.
    */
  def httpContentType(payload: Column): Column =
    // trim: an empty header value makes `\s*` backtrack and the
    // capture swallow the separator space; split on ';' drops the
    // parameter section (split('') = [''] keeps the absent case '')
    trim(element_at(split(regexp_extract(
      regexp_extract(payload, "(?s)^(.*?)\\r\\n\\r\\n", 1),
      "(?i)Content-Type:\\s*([^\\r\\n]+)", 1), ";"), 1))

  /** `Location` header of an HTTP payload, '' when absent — the 3xx
    * redirect target; header-anchored like [[httpContentType]].
    */
  def httpLocation(payload: Column): Column =
    trim(regexp_extract(
      regexp_extract(payload, "(?s)^(.*?)\\r\\n\\r\\n", 1),
      "(?i)Location:\\s*([^\\r\\n]+)", 1))

  /** A 3xx redirect response payload: status line + `Location`
    * header, empty entity body (how crawlers actually see moved
    * pages; the content-type filter naturally drops these from the
    * extraction path while [[httpLocation]] recovers the target).
    */
  def httpRedirect(status: Column, location: Column): Column =
    concat(lit("HTTP/1.1 "), status.cast("string"), lit(" Moved"),
      lit(Crlf), lit("Location: "), location, lit(Crlf), lit(Crlf))

  /** Entity body of an HTTP payload (everything after the first blank
    * line; the `^` anchor makes the replace single-shot on BOTH
    * engines — Spark replaces all matches per pass, DuckDB one, and an
    * anchored pattern can only match once).
    */
  def httpBody(payload: Column): Column =
    regexp_replace(payload, "(?s)^.*?\\r\\n\\r\\n", "")

  /** Lossless string view of a BINARY payload: ISO-8859-1 maps every
    * byte to the same-numbered codepoint, bijectively — so the header
    * extracts ([[httpStatus]]/[[httpContentType]]/[[httpCharset]]/
    * [[httpContentEncoding]]/[[httpLocation]]/[[httpBody]]) all work
    * unchanged on byte payloads, and [[bodyBytes]] recovers the exact
    * entity bytes by re-encoding. Pure codegen'd column work, no
    * custom splitter.
    */
  def payloadText(payload: Column): Column =
    decode(payload, "ISO-8859-1")

  /** Exact entity-body BYTES of a binary payload (via the latin-1
    * bijection — see [[payloadText]]).
    */
  def bodyBytes(payload: Column): Column =
    encode(httpBody(payloadText(payload)), "ISO-8859-1")

  /** `charset` parameter of the Content-Type header, lowercased, ''
    * when absent — the decode selector for non-UTF-8 bodies;
    * header-anchored like [[httpContentType]].
    */
  def httpCharset(payload: Column): Column =
    lower(trim(regexp_extract(
      regexp_extract(payload, "(?s)^(.*?)\\r\\n\\r\\n", 1),
      "(?i)Content-Type:[^\\r\\n]*;\\s*charset=\"?([A-Za-z0-9_.:-]+)", 1)))

  /** `Content-Encoding` header value, lowercased, '' when absent
    * (identity) — the transport-compression selector.
    */
  def httpContentEncoding(payload: Column): Column =
    lower(trim(regexp_extract(
      regexp_extract(payload, "(?s)^(.*?)\\r\\n\\r\\n", 1),
      "(?i)Content-Encoding:\\s*([^\\r\\n]+)", 1)))

  /** Entity bytes through the declared `Content-Encoding`: '' /
    * `identity` pass through, `gzip`/`x-gzip` multi-member inflate,
    * `deflate` zlib-with-raw-fallback, `br` the from-scratch RFC 7932
    * inflate ([[graft.functions.Brotli]] — full bit format incl. the
    * Appendix-A static dictionary and word transforms, closing the
    * round-18 scope guard: `br` is ubiquitous on the real web and a
    * loud refusal shed that corpus fraction) — and ANY OTHER coding
    * (`zstd`, `compress`, …) raises LOUDLY from the plan: passing
    * still-compressed bytes to the charset decode would feed
    * deterministic mojibake into the corpus SILENTLY — the one
    * failure mode this layer must never have. The error carries the
    * offending coding so an operator can route those records to a
    * sidecar rather than guess.
    */
  def decodeContentCoding(bytes: Column, encoding: Column): Column = {
    val enc = lower(trim(encoding))
    when(enc === "" || enc === "identity", bytes)
      .when(enc === "gzip" || enc === "x-gzip",
        graft.functions.Gzip.inflateCol(bytes))
      .when(enc === "deflate",
        graft.functions.Gzip.inflateDeflateCol(bytes))
      .when(enc === "br", graft.functions.BrotliCols.inflateCol(bytes))
      .otherwise(raise_error(concat(
        lit("unsupported Content-Encoding (scope boundary, "),
        lit("refusing to pass compressed bytes to the charset "),
        lit("decode): "), enc)).cast("binary"))
  }

  /** WHATWG label → canonical encoding name: every browser treats
    * `iso-8859-1` (and its aliases `latin1`/`l1`/`cp819`/…) and
    * `us-ascii`/`ascii` as WINDOWS-1252 — real latin-1-labeled pages
    * use 0x80–0x9F for curly quotes and dashes, and a C1-identity
    * decode silently corrupts them. UTF-8 aliases fold to `utf-8`;
    * unknown labels pass through (they take the lenient-UTF-8 default
    * in [[decodeBody]]). Labels are DATA ([[httpCharset]] /
    * [[metaCharset]] return them raw); normalization is a decode-time
    * concern, applied here and inside [[decodeBody]].
    */
  def normalizeCharset(charset: Column): Column = {
    val cs = lower(trim(charset))
    when(cs.isin("windows-1252", "x-cp1252", "cp1252", "cp819",
      "ibm819", "iso-8859-1", "iso8859-1", "iso_8859-1", "iso88591",
      "iso-ir-100", "latin-1", "latin1", "l1", "us-ascii", "ascii",
      "ansi_x3.4-1968"), lit("windows-1252"))
      .when(cs.isin("utf-8", "utf8", "unicode-1-1-utf-8",
        "unicode11utf8", "x-unicode20utf8"), lit("utf-8"))
      // WHATWG: the bare "utf-16"/"unicode" labels mean LITTLE-endian
      .when(cs.isin("utf-16le", "utf-16", "utf16", "unicode",
        "csunicode", "iso-10646-ucs-2", "ucs-2"), lit("utf-16le"))
      .when(cs.isin("utf-16be", "unicodefffe"), lit("utf-16be"))
      // CJK legacy multibyte families (WHATWG label sets): a large
      // share of the non-Latin web declares these; an unmapped alias
      // would fall to the lenient-UTF-8 default and admit silent
      // mojibake into the corpus. WHATWG Shift_JIS is the windows-31j
      // superset, euc-kr the windows-949 superset, gb2312 folds into
      // GBK — the canonical name here selects the superset decoder in
      // [[decodeBody]], exactly as browsers do.
      .when(cs.isin("shift_jis", "shift-jis", "sjis", "x-sjis",
        "ms_kanji", "ms932", "csshiftjis", "windows-31j"),
        lit("shift_jis"))
      .when(cs.isin("euc-jp", "x-euc-jp", "cseucpkdfmtjapanese"),
        lit("euc-jp"))
      .when(cs.isin("gbk", "gb2312", "gb_2312", "gb_2312-80", "chinese",
        "csgb2312", "csiso58gb231280", "iso-ir-58", "x-gbk"), lit("gbk"))
      .when(cs.isin("big5", "big5-hkscs", "cn-big5", "csbig5",
        "x-x-big5"), lit("big5"))
      .when(cs.isin("euc-kr", "cseuckr", "korean", "ks_c_5601-1987",
        "ks_c_5601-1989", "ksc5601", "ksc_5601", "csksc56011987",
        "iso-ir-149", "windows-949"), lit("euc-kr"))
      .otherwise(cs)
  }

  /** Canonical charset name ([[normalizeCharset]] output) → the JDK
    * decoder [[decodeBody]] uses for it. The CJK canonical names pick
    * the WHATWG SUPERSET codecs (shift_jis → windows-31j, euc-kr →
    * windows-949): pages labeled with the narrow name routinely carry
    * vendor-extension codepoints, and browsers decode them through the
    * superset — matching that is what keeps real crawl text clean.
    */
  private[sources] val CjkJdkCharset: Map[String, String] = Map(
    "shift_jis" -> "windows-31j",
    "euc-jp" -> "EUC-JP",
    "gbk" -> "GBK",
    // WHATWG big5 is the HKSCS superset (its index includes the Hong
    // Kong extension rows) — plain JDK Big5 would decode HKSCS
    // codepoints under a big5-family label to U+FFFD, inconsistent
    // with the superset policy of the other four families.
    "big5" -> "Big5-HKSCS",
    "euc-kr" -> "x-windows-949")

  /** Byte-order-mark charset of an entity body, '' when none — the
    * FIRST step of the WHATWG encoding sniff: a BOM beats even the
    * transport header (a mislabeled Content-Type cannot override
    * bytes the serializer actually wrote), so the effective charset
    * is coalesce(BOM, header param, meta element, default).
    */
  def bomCharset(bytes: Column): Column =
    when(hex(substring(bytes, 1, 3)) === "EFBBBF", lit("utf-8"))
      .when(hex(substring(bytes, 1, 2)) === "FEFF", lit("utf-16be"))
      .when(hex(substring(bytes, 1, 2)) === "FFFE", lit("utf-16le"))
      .otherwise(lit(""))

  /** The 27 bytes windows-1252 maps off the latin-1 identity (WHATWG
    * index; 0x81/0x8D/0x8F/0x90/0x9D stay C1-identity there too) — as
    * codepoint strings, so the decode is ONE `translate` over the
    * latin-1 view: pure codegen'd column work, and exactly invertible
    * for fixture building.
    */
  private[sources] val Cp1252From: String =
    "\u0080\u0082\u0083\u0084\u0085\u0086\u0087\u0088\u0089" +
      "\u008A\u008B\u008C\u008E\u0091\u0092\u0093\u0094\u0095" +
      "\u0096\u0097\u0098\u0099\u009A\u009B\u009C\u009E\u009F"
  private[sources] val Cp1252To: String =
    "\u20AC\u201A\u0192\u201E\u2026\u2020\u2021\u02C6\u2030" +
      "\u0160\u2039\u0152\u017D\u2018\u2019\u201C\u201D\u2022" +
      "\u2013\u2014\u02DC\u2122\u0161\u203A\u0153\u017E\u0178"

  /** Encode text to windows-1252 BYTES for codepoints in the cp1252
    * repertoire's latin-1-plus-remap subset — the inverse translate
    * composed with the latin-1 bijection (fixture builder; codepoints
    * outside the repertoire would need a real charset encoder).
    */
  def encodeCp1252(text: Column): Column =
    encode(translate(text, Cp1252To, Cp1252From), "ISO-8859-1")

  /** Entity bytes → text under the response's declared charset:
    * labels normalizing to windows-1252 ([[normalizeCharset]] — incl.
    * `iso-8859-1`/`latin1`/`us-ascii`, per WHATWG) decode through the
    * latin-1 byte↔codepoint identity plus the 0x80–0x9F cp1252 remap
    * (ONE `translate` — see [[Cp1252From]]); everything else (incl.
    * '' — HTML5's default for the synthetic corpus) decodes as
    * LENIENT UTF-8 ([[graft.functions.Gzip.utf8LenientCol]] —
    * Spark 4's built-in `decode` REPORTS malformed bytes, and one
    * mislabeled-charset response must not kill a crawl job). A body
    * whose bytes disagree with the declared charset surfaces as
    * replacement characters and fails its clean-match downstream —
    * visible per record, fatal never.
    */
  def decodeBody(bytes: Column, charset: Column): Column = {
    val cs = normalizeCharset(charset)
    // BOM bytes are framing, not content (WHATWG strips them before
    // the decode); the latin-1/cp1252 identity branch keeps its bytes
    // verbatim — a BOM cannot reach that branch through the sniff.
    // Each UTF-16 branch strips ONLY the BOM matching its own
    // endianness (FFFE for LE, FEFF for BE): a wrong-endian BOM under
    // an explicit utf-16le/be label is NOT silently consumed — it
    // decodes as a replacement/garbled character, so the label-vs-bytes
    // disagreement stays visible in the clean match downstream.
    def strip2(magic: String) =
      when(hex(substring(bytes, 1, 2)) === magic,
        bytes.substr(lit(3), length(bytes) - 2)).otherwise(bytes)
    val b8 = when(hex(substring(bytes, 1, 3)) === "EFBBBF",
      bytes.substr(lit(4), length(bytes) - 3)).otherwise(bytes)
    // CJK branches decode their bytes verbatim (no BOM concept in the
    // legacy multibyte encodings) through the WHATWG superset codecs —
    // lenient like every other branch: one mislabeled response
    // surfaces as U+FFFD and fails its clean match, never kills a job.
    val base = when(cs === "windows-1252",
      translate(decode(bytes, "ISO-8859-1"), Cp1252From, Cp1252To))
      .when(cs === "utf-16le",
        graft.functions.Gzip.decodeLenientCol(strip2("FFFE"), "UTF-16LE"))
      .when(cs === "utf-16be",
        graft.functions.Gzip.decodeLenientCol(strip2("FEFF"), "UTF-16BE"))
    CjkJdkCharset.toSeq.sortBy(_._1).foldLeft(base) {
      case (acc, (canon, jdk)) => acc.when(cs === canon,
        graft.functions.Gzip.decodeLenientCol(bytes, jdk))
    }.otherwise(graft.functions.Gzip.utf8LenientCol(b8))
  }

  /** Frequency-sniffed charset of unlabeled entity BYTES
    * ([[graft.functions.Sniff]] — deterministic chardet posture), ''
    * when the sniff abstains: the LAST leg of the effective-charset
    * lattice, after BOM ([[bomCharset]]), the header parameter
    * ([[httpCharset]]) and the meta element ([[metaCharset]]) have all
    * come up empty — a legacy page with no label at all decodes
    * through its sniffed codec instead of falling straight to
    * lenient-UTF-8 mojibake (q301).
    */
  def sniffCharset(bytes: Column): Column =
    graft.functions.SniffCols.sniffCol(bytes)

  /** Charset declared INSIDE the document — HTML5's fallback when the
    * transport header carries no parameter: `<meta charset=...>` wins
    * over the legacy `<meta http-equiv content="...charset=...">`
    * form; '' when neither appears. Read on the latin-1 view
    * ([[payloadText]]/[[httpBody]]), which is ASCII-transparent, so
    * the sniff is safe BEFORE the real charset is known — exactly the
    * bootstrap the HTML5 prescan does.
    */
  def metaCharset(body: Column): Column = {
    val c1 = regexp_extract(body,
      "(?i)<meta\\s+charset=[\"']?([A-Za-z0-9_.:-]+)", 1)
    val c2 = regexp_extract(body,
      "(?i)<meta[^>]+charset=([A-Za-z0-9_.:-]+)", 1)
    lower(trim(when(c1 =!= "", c1).otherwise(c2)))
  }

  /** `ETag` header value of an HTTP payload with the quotes stripped,
    * '' when absent — the entity validator for If-None-Match
    * revalidation (the OTHER, content-addressed half of conditional
    * fetch: If-Modified-Since trusts timestamps, an ETag is a hash of
    * the bytes, so a spurious lastmod bump cannot force a body
    * transfer). Header-anchored like [[httpContentType]]; weak
    * validators (`W/"…"`) keep their `W/` marker visible: the marker
    * and the quoted value are captured SEPARATELY and re-concatenated
    * (`W/"abc"` → `W/abc`, `"abc"` → `abc`) — a single quote-stripping
    * capture would stop at the opening quote and collapse every weak
    * etag to the bare `W/`, a latent false-304.
    */
  def httpEtag(payload: Column): Column = {
    val hdr = regexp_extract(payload, "(?s)^(.*?)\\r\\n\\r\\n", 1)
    // (?m)^ anchors the header NAME to a line start (an `X-ETag:`
    // header must not match); upper() canonicalizes the weak marker —
    // RFC 9110 defines it as the literal `W/`, and a `w/"abc"` from a
    // sloppy server must compare equal to `W/"abc"`, not miss its 304.
    concat(
      upper(regexp_extract(hdr, "(?im)^ETag:\\s*(W/)?\"?[^\"\\r\\n]", 1)),
      trim(regexp_extract(hdr, "(?im)^ETag:\\s*(?:W/)?\"?([^\"\\r\\n]+)", 1)))
  }

  /** `Cache-Control: … max-age=N` delta seconds of an HTTP payload,
    * NULL when the header (or the directive) is absent — the
    * freshness-lifetime source RFC 9111 prefers over `Expires`. A
    * fresh stored response is served WITHOUT any request: freshness
    * sits in front of the revalidation tier (If-Modified-Since /
    * If-None-Match), which itself sits in front of a full refetch.
    * Header-anchored like [[httpContentType]]; `\bmax-age` keeps
    * `s-maxage` (a different token) from matching.
    */
  def httpCacheControlMaxAge(payload: Column): Column = {
    val v = regexp_extract(
      regexp_extract(payload, "(?s)^(.*?)\\r\\n\\r\\n", 1),
      "(?i)Cache-Control:[^\\r\\n]*\\bmax-age=([0-9]+)", 1)
    when(v =!= "", v.cast("long"))
  }

  /** Raw `Expires` header value, '' when absent (the value is an HTTP
    * date — convert with [[httpDateEpoch]]). Per RFC 9111 it is only
    * consulted when `Cache-Control: max-age` is absent.
    */
  def httpExpires(payload: Column): Column =
    trim(regexp_extract(
      regexp_extract(payload, "(?s)^(.*?)\\r\\n\\r\\n", 1),
      "(?i)Expires:\\s*([^\\r\\n]+)", 1))

  /** IMF-fixdate (RFC 9110 `Sun, 06 Nov 1994 08:49:37 GMT`) → epoch
    * seconds, NULL on anything unparsable — RFC 9111 treats an invalid
    * `Expires` as already expired, and the NULL propagates into
    * exactly that branch downstream.
    */
  def httpDateEpoch(value: Column): Column =
    // Spark's formatter allows day-of-week (EEE) only when FORMATTING;
    // the parse drops the redundant weekday prefix first
    try_to_timestamp(regexp_extract(value, "^[A-Za-z]{3}, (.*)$", 1),
      lit("dd MMM yyyy HH:mm:ss 'GMT'")).cast("long")

  /** Epoch seconds → IMF-fixdate (the inverse of [[httpDateEpoch]];
    * the session TZ is pinned UTC so the rendered date IS GMT).
    */
  def httpDateOf(epoch: Column): Column =
    date_format(timestamp_seconds(epoch),
      "EEE, dd MMM yyyy HH:mm:ss 'GMT'")

  /** Raw `Last-Modified` header value, '' when absent (an HTTP date —
    * [[httpDateEpoch]]). Feeds BOTH conditional revalidation
    * (If-Modified-Since) and RFC 9111 §4.2.2 HEURISTIC freshness: when
    * a response carries neither `max-age` nor `Expires`, caches
    * typically use 10% of (date − last-modified) as the lifetime.
    */
  def httpLastModified(payload: Column): Column =
    trim(regexp_extract(
      regexp_extract(payload, "(?s)^(.*?)\\r\\n\\r\\n", 1),
      "(?i)Last-Modified:\\s*([^\\r\\n]+)", 1))

  /** RFC 9111 freshness lifetime in seconds: `max-age` wins, else
    * `Expires − stored-at`, else the §4.2.2 heuristic — 10% of
    * (stored-at − last-modified), truncating division (exact-integer,
    * cross-engine `div`) — else 0 (always stale). NULL-safe: each
    * absent input falls through to the next tier.
    */
  def freshnessLifetime(maxAge: Column, expiresEpoch: Column,
      lastModifiedEpoch: Column, storedAtEpoch: Column): Column =
    when(maxAge.isNotNull, maxAge)
      .when(expiresEpoch.isNotNull,
        greatest(expiresEpoch - storedAtEpoch, lit(0L)))
      .when(lastModifiedEpoch.isNotNull,
        // integral `div` — the repo's cross-engine division idiom
        // (exact at ANY int64 magnitude; the old double-divide+cast
        // was exact only while the delta stayed under ~2^49 s)
        org.apache.spark.sql.graft.ColumnBridge.column(
          new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
            org.apache.spark.sql.graft.ColumnBridge.expression(
              greatest(storedAtEpoch - lastModifiedEpoch, lit(0L))),
            org.apache.spark.sql.graft.ColumnBridge.expression(lit(10L)))))
      .otherwise(lit(0L))

  /** [[httpResponse]] with caching metadata — `ETag`, `Cache-Control`,
    * `Expires` ('' omits each): how an origin that supports freshness
    * AND revalidation actually answers a 200.
    */
  def httpResponseCaching(status: Column, contentType: Column,
      etag: Column, cacheControl: Column, expires: Column,
      body: Column): Column =
    httpResponseCachingFull(status, contentType, etag, cacheControl,
      expires, lit(""), body)

  /** [[httpResponseCaching]] plus a `Last-Modified` header ('' omits)
    * — the full caching-metadata answer, incl. the header the §4.2.2
    * heuristic lifetime reads.
    */
  def httpResponseCachingFull(status: Column, contentType: Column,
      etag: Column, cacheControl: Column, expires: Column,
      lastModified: Column, body: Column): Column =
    concat(lit("HTTP/1.1 "), status.cast("string"), lit(" "),
      when(status.isin(200), lit("OK"))
        .when(status.isin(304), lit("Not Modified"))
        .otherwise(lit("Status")),
      lit(Crlf), lit("Content-Type: "), contentType, lit(Crlf),
      when(etag.isin(""), lit(""))
        .otherwise(concat(lit("ETag: \""), etag, lit("\""), lit(Crlf))),
      when(cacheControl.isin(""), lit(""))
        .otherwise(concat(lit("Cache-Control: "), cacheControl,
          lit(Crlf))),
      when(expires.isin(""), lit(""))
        .otherwise(concat(lit("Expires: "), expires, lit(Crlf))),
      when(lastModified.isin(""), lit(""))
        .otherwise(concat(lit("Last-Modified: "), lastModified,
          lit(Crlf))),
      lit(Crlf), body)

  /** [[httpResponse]] with an `ETag` header (`etag` = '' to omit) —
    * how a validator-emitting server actually answers both a 200
    * (current etag alongside the body) and a 304 (the validator that
    * matched, no body).
    */
  def httpResponseEtag(status: Column, contentType: Column,
      etag: Column, body: Column): Column =
    concat(lit("HTTP/1.1 "), status.cast("string"), lit(" "),
      when(status.isin(200), lit("OK"))
        .when(status.isin(304), lit("Not Modified"))
        .when(status.isin(404), lit("Not Found"))
        .otherwise(lit("Status")),
      lit(Crlf), lit("Content-Type: "), contentType, lit(Crlf),
      when(etag.isin(""), lit(""))
        .otherwise(concat(lit("ETag: \""), etag, lit("\""), lit(Crlf))),
      lit(Crlf), body)

  /** `Transfer-Encoding` header value, lowercased, '' when absent —
    * the transfer-coding selector ([[graft.functions.Chunked]]
    * dechunks `chunked` bodies BEFORE the Content-Encoding inflate,
    * which runs before the charset decode: the real HTTP onion).
    */
  def httpTransferEncoding(payload: Column): Column =
    lower(trim(regexp_extract(
      regexp_extract(payload, "(?s)^(.*?)\\r\\n\\r\\n", 1),
      "(?i)Transfer-Encoding:\\s*([^\\r\\n]+)", 1)))

  /** [[httpResponseBytes]] with the entity CHUNK-FRAMED
    * (`Transfer-Encoding: chunked`, RFC 9112 §7.1) — no
    * Content-Length, hex-size chunk framing via
    * [[graft.functions.Chunked.encodeCol]]. `chunkSize` may vary per
    * row (coverage of multi-chunk bodies at every body length).
    */
  def httpResponseChunked(status: Column, mediaType: Column,
      charset: Column, encoding: Column, body: Column,
      chunkSize: Column): Column = {
    val header = concat(lit("HTTP/1.1 "), status.cast("string"),
      lit(" "),
      when(status.isin(200), lit("OK")).otherwise(lit("Status")),
      lit(Crlf), lit("Content-Type: "), mediaType,
      when(charset.isin(""), lit(""))
        .otherwise(concat(lit("; charset="), charset)),
      lit(Crlf),
      when(encoding.isin(""), lit(""))
        .otherwise(concat(lit("Content-Encoding: "), encoding,
          lit(Crlf))),
      lit("Transfer-Encoding: chunked"), lit(Crlf),
      lit(Crlf))
    concat(encode(header, "ISO-8859-1"),
      graft.functions.Chunked.encodeCol(body, chunkSize))
  }

  /** An HTTP/1.1 response as BYTES: ASCII status line + headers
    * (optional charset parameter, optional Content-Encoding), then the
    * entity BYTES verbatim — the binary sibling of [[httpResponse]]
    * for bodies that are not UTF-8 text. `charset`/`encoding` are ''
    * to omit the parameter/header.
    */
  def httpResponseBytes(status: Column, mediaType: Column,
      charset: Column, encoding: Column, body: Column): Column = {
    val header = concat(lit("HTTP/1.1 "), status.cast("string"),
      lit(" "),
      when(status.isin(200), lit("OK")).otherwise(lit("Status")),
      lit(Crlf), lit("Content-Type: "), mediaType,
      when(charset.isin(""), lit(""))
        .otherwise(concat(lit("; charset="), charset)),
      lit(Crlf),
      when(encoding.isin(""), lit(""))
        .otherwise(concat(lit("Content-Encoding: "), encoding,
          lit(Crlf))),
      lit(Crlf))
    concat(encode(header, "ISO-8859-1"), body)
  }
}
