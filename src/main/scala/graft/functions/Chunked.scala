package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType}

/** HTTP/1.1 `Transfer-Encoding: chunked` framing as native codegen
  * expressions — the transport layer between the WARC record and the
  * `Content-Encoding` body (RFC 9112 §7.1: hex chunk-size line, chunk
  * bytes, CRLF, … , a zero-size last chunk, optional trailer fields,
  * final CRLF). Ubiquitous in real HTTP/1.1 captures; a reader that
  * splits at the first blank line and stops would concatenate
  * chunk-size lines into the text. Same static-helper idiom as
  * [[GzipDeflate]]: bodies are KiB-sized, dechunked exactly once per
  * record on the scan path, inside whole-stage codegen.
  *
  * Onion order is the real HTTP one: dechunk FIRST (transfer coding
  * frames the wire bytes), then `Content-Encoding` inflate, then
  * charset decode.
  */
case class ChunkEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "chunk_encode"

  override def nullSafeEval(b: Any, sz: Any): Any =
    Chunked.encode(b.asInstanceOf[Array[Byte]], sz.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, sz) => s"""
       |${ev.value} = graft.functions.Chunked.encode($b, $sz);
     """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ChunkEncode =
    copy(left = newLeft, right = newRight)
}

/** Inverse of [[ChunkEncode]]: concatenated chunk bytes. Accepts
  * chunk extensions (`;name=value` after the size) and trailer fields
  * after the last chunk, both skipped; malformed framing THROWS with
  * the byte offset — loud, never guessed (the Warc parse posture).
  */
case class Dechunk(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "dechunk"

  override def nullSafeEval(a: Any): Any =
    Chunked.dechunk(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.Chunked.dechunk($c);
     """.stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): Dechunk = copy(child = newChild)
}

object Chunked {

  private val Ascii = java.nio.charset.StandardCharsets.US_ASCII

  /** Frame `b` as equal `sz`-byte chunks (last one short), lowercase
    * hex sizes, zero-size last chunk, NO trailers (a fixture may
    * splice its own before the final CRLF).
    */
  def encode(b: Array[Byte], sz: Int): Array[Byte] = {
    require(sz > 0, s"chunk size must be positive, got $sz")
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < b.length) {
      val n = math.min(sz, b.length - i)
      out.write(java.lang.Integer.toHexString(n).getBytes(Ascii))
      out.write('\r'); out.write('\n')
      out.write(b, i, n)
      out.write('\r'); out.write('\n')
      i += n
    }
    out.write("0\r\n\r\n".getBytes(Ascii))
    out.toByteArray
  }

  /** Concatenated chunk data of a chunked body; throws
    * IllegalArgumentException with the byte offset on malformed
    * framing (bad hex, missing CRLF, truncated chunk, unterminated
    * trailers).
    */
  def dechunk(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"chunked body at byte $i: $msg")
    def line(): String = {
      val start = i
      while (i + 1 < b.length && !(b(i) == '\r' && b(i + 1) == '\n'))
        i += 1
      if (i + 1 >= b.length) fail("unterminated line")
      val s = new String(b, start, i - start, Ascii)
      i += 2
      s
    }
    var done = false
    while (!done) {
      val sizeLine = line()
      val hexPart = {
        val semi = sizeLine.indexOf(';') // chunk extension — skipped
        if (semi >= 0) sizeLine.substring(0, semi) else sizeLine
      }.trim
      // length cap keeps parseLong in range (8 hex digits = 2^32-1);
      // the size itself is then range-checked in LONG arithmetic so a
      // near-Int.MaxValue chunk cannot overflow the truncation guard
      // into a negative pass — every oversized size stays inside the
      // documented loud-IAE-with-offset contract
      if (hexPart.isEmpty || hexPart.length > 8 || !hexPart.forall(c =>
          (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') ||
            (c >= 'A' && c <= 'F')))
        fail(s"bad chunk size '$hexPart'")
      val n64 = java.lang.Long.parseLong(hexPart, 16)
      if (n64 > b.length.toLong) fail(s"truncated chunk of $n64 bytes")
      val n = n64.toInt
      if (n == 0) {
        // trailer section: header lines until the empty line
        var t = line()
        while (t.nonEmpty) t = line()
        done = true
      } else {
        if (i.toLong + n + 2 > b.length) fail(s"truncated chunk of $n bytes")
        out.write(b, i, n)
        i += n
        if (!(b(i) == '\r' && b(i + 1) == '\n'))
          fail("missing CRLF after chunk data")
        i += 2
      }
    }
    if (i != b.length) fail(s"${b.length - i} trailing bytes after last chunk")
    out.toByteArray
  }

  def encodeCol(bytes: Column, size: Column): Column =
    ColumnBridge.column(ChunkEncode(ColumnBridge.expression(bytes),
      ColumnBridge.expression(size.cast("int"))))

  def dechunkCol(bytes: Column): Column =
    ColumnBridge.column(Dechunk(ColumnBridge.expression(bytes)))
}
