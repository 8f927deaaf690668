package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Gzip member codec as native codegen expressions — the
  * `Content-Encoding: gzip` entity-body layer of HTTP-aware crawl
  * ingest (reference scope: the staging feed `SCD_script.txt:83-116`,
  * generalized to compressed transport). Same static-helper idiom as
  * [[TokenBinary]]: bodies are KiB-sized, and a compressed body is
  * decompressed exactly once per record on the scan path, so the work
  * is per-row bounded and stays inside whole-stage codegen.
  *
  * Determinism note: [[Gzip.deflate]] output bytes are stable for a
  * given JDK (fixed header, MTIME=0, default level), but NOTHING
  * cross-engine ever compares compressed bytes — oracles always
  * replay from the pre-compression truth; only the inflate round-trip
  * is verified.
  */
case class GzipDeflate(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "gzip_deflate"
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(a: Any): Any =
    Gzip.deflate(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.Gzip.deflate($c);
     """.stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): GzipDeflate = copy(child = newChild)
}

/** Inverse of [[GzipDeflate]]: NULL unless the buffer starts with the
  * gzip magic (a torn or identity-encoded body must surface as NULL,
  * not decode garbage); corrupt members past the magic THROW — loud,
  * never guessed (the Warc parse posture).
  */
case class GzipInflate(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "gzip_inflate"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    Gzip.inflate(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.Gzip.inflate($c);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): GzipInflate = copy(child = newChild)
}

/** `Content-Encoding: deflate` inflate — the second most common HTTP
  * body encoding after gzip, and AMBIGUOUS in the wild: RFC 9110 says
  * zlib-wrapped (RFC 1950), but a long tail of servers sends RAW
  * deflate (RFC 1951) under the same label. This does what every
  * browser does: try zlib first, fall back to raw; corrupt under BOTH
  * framings THROWS — loud, never guessed. NULL on an empty buffer
  * (a deflate body cannot be zero bytes under either framing).
  */
case class DeflateInflate(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "deflate_inflate"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    Gzip.inflateDeflate(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.Gzip.inflateDeflate($c);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): DeflateInflate = copy(child = newChild)
}

/** Deflate compressor for the non-gzip framings — zlib-wrapped
  * (`raw = false`, RFC 1950) or raw (`raw = true`, RFC 1951); the
  * fixture side of [[DeflateInflate]], same codegen static-helper
  * idiom as [[GzipDeflate]].
  */
case class ZlibDeflate(child: Expression, raw: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "zlib_deflate"
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(a: Any): Any =
    if (raw) Gzip.deflateRaw(a.asInstanceOf[Array[Byte]])
    else Gzip.deflateZlib(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (raw) "deflateRaw" else "deflateZlib"
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.Gzip.$m($c);
     """.stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): ZlibDeflate = copy(child = newChild)
}

/** Lenient UTF-8 decode: malformed sequences become U+FFFD instead of
  * throwing — Spark 4's built-in `decode` REPORTS coding errors, which
  * would let ONE mislabeled-charset response kill a whole crawl-ingest
  * job. Replacement characters flow on and fail their clean-match
  * downstream: visible per-record, fatal never.
  */
case class Utf8DecodeLenient(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "utf8_decode_lenient"
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(a: Any): Any =
    Gzip.utf8Lenient(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.Gzip.utf8Lenient($c);
     """.stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): Utf8DecodeLenient = copy(child = newChild)
}

/** Lenient decode for an arbitrary (plan-literal) JVM charset —
  * [[Utf8DecodeLenient]] generalized for the UTF-16 transport
  * branches: malformed sequences (odd byte counts, unpaired
  * surrogates) become U+FFFD instead of killing the job.
  */
case class CharsetDecodeLenient(child: Expression, charset: String)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "charset_decode_lenient"
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(a: Any): Any =
    Gzip.decodeLenient(a.asInstanceOf[Array[Byte]], charset)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cs = ctx.addReferenceObj("charsetName", charset, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.Gzip.decodeLenient($c, $cs);
     """.stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): CharsetDecodeLenient = copy(child = newChild)
}

object Gzip {

  /** One gzip member over the whole buffer (JDK GZIPOutputStream:
    * fixed header, zero MTIME — byte-stable per JDK).
    */
  def deflate(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(out)
    // close() ends the native Deflater eagerly — per-row deflates must
    // not leave native memory to the GC/cleaner at corpus scale
    try { g.write(b); g.finish() } finally g.close()
    out.toByteArray
  }

  /** All members inflated and concatenated; null when the magic is
    * absent, IllegalArgumentException on corrupt bytes past it.
    */
  def inflate(b: Array[Byte]): Array[Byte] = {
    if (b.length < 2 || (b(0) & 0xFF) != 0x1F || (b(1) & 0xFF) != 0x8B)
      return null
    try new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(b)).readAllBytes()
    catch {
      case e: java.io.IOException =>
        throw new IllegalArgumentException(
          s"corrupt gzip member (${b.length} bytes): ${e.getMessage}")
    }
  }

  /** Zlib-wrapped (RFC 1950) deflate of the whole buffer — the
    * RFC-correct `Content-Encoding: deflate` framing (fixture
    * builder; byte-stable per JDK, and nothing cross-engine compares
    * compressed bytes).
    */
  def deflateZlib(b: Array[Byte]): Array[Byte] =
    deflateWith(b, nowrap = false)

  /** RAW (RFC 1951) deflate — the wild-tail framing some servers send
    * under the same `deflate` label.
    */
  def deflateRaw(b: Array[Byte]): Array[Byte] =
    deflateWith(b, nowrap = true)

  private def deflateWith(b: Array[Byte], nowrap: Boolean): Array[Byte] = {
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, nowrap)
    try {
      d.setInput(b); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end() // native Deflater freed eagerly, not left to GC
  }

  /** Browser-style `deflate` inflate: zlib-wrapped first, RAW deflate
    * on failure; null for an empty buffer; IllegalArgumentException
    * when BOTH framings reject the bytes.
    */
  def inflateDeflate(b: Array[Byte]): Array[Byte] = {
    if (b.length == 0) return null
    try inflateWith(b, nowrap = false)
    catch {
      case _: java.util.zip.DataFormatException =>
        try inflateWith(b, nowrap = true)
        catch {
          case e: java.util.zip.DataFormatException =>
            throw new IllegalArgumentException(
              s"corrupt deflate body (${b.length} bytes, " +
                s"zlib and raw both rejected): ${e.getMessage}")
        }
    }
  }

  private def inflateWith(b: Array[Byte], nowrap: Boolean): Array[Byte] = {
    val inf = new java.util.zip.Inflater(nowrap)
    try {
      inf.setInput(b)
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && !inf.finished()) {
          if (inf.needsInput() || inf.needsDictionary())
            throw new java.util.zip.DataFormatException(
              "truncated or dictionary-requiring deflate stream")
        } else out.write(buf, 0, n)
      }
      out.toByteArray
    } finally inf.end()
  }

  /** UTF-8 with CodingErrorAction.REPLACE (the JDK decoder's U+FFFD
    * substitution — deterministic, standard).
    */
  def utf8Lenient(b: Array[Byte]): org.apache.spark.unsafe.types.UTF8String = {
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
    org.apache.spark.unsafe.types.UTF8String.fromString(
      dec.decode(java.nio.ByteBuffer.wrap(b)).toString)
  }

  /** Any JVM charset with CodingErrorAction.REPLACE. */
  def decodeLenient(b: Array[Byte],
      charset: String): org.apache.spark.unsafe.types.UTF8String = {
    val dec = java.nio.charset.Charset.forName(charset).newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
    org.apache.spark.unsafe.types.UTF8String.fromString(
      dec.decode(java.nio.ByteBuffer.wrap(b)).toString)
  }

  def decodeLenientCol(bytes: Column, charset: String): Column =
    ColumnBridge.column(CharsetDecodeLenient(
      ColumnBridge.expression(bytes), charset))

  def deflateCol(bytes: Column): Column =
    ColumnBridge.column(GzipDeflate(ColumnBridge.expression(bytes)))

  def inflateCol(bytes: Column): Column =
    ColumnBridge.column(GzipInflate(ColumnBridge.expression(bytes)))

  def inflateDeflateCol(bytes: Column): Column =
    ColumnBridge.column(DeflateInflate(ColumnBridge.expression(bytes)))

  def deflateZlibCol(bytes: Column): Column =
    ColumnBridge.column(ZlibDeflate(ColumnBridge.expression(bytes),
      raw = false))

  def deflateRawCol(bytes: Column): Column =
    ColumnBridge.column(ZlibDeflate(ColumnBridge.expression(bytes),
      raw = true))

  def utf8LenientCol(bytes: Column): Column =
    ColumnBridge.column(Utf8DecodeLenient(ColumnBridge.expression(bytes)))
}
