package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen expression.
  *
  * Canonical composition (NFC) folds canonically-equivalent spellings
  * onto one byte sequence — `e` + COMBINING ACUTE (U+0065 U+0301)
  * becomes `é` (U+00E9) — so the text-dedup canonical form treats
  * NFC/NFD variant spellings of the same text as the same document.
  * Standard Unicode normalization (`java.text.Normalizer`), bit-equal
  * to DuckDB's `nfc_normalize` (both implement UAX #15), which is what
  * the oracle replays.
  *
  * The ASCII fast path skips normalization entirely: NFC is the
  * identity on pure-ASCII strings, and `UTF8String` exposes the bytes
  * for a zero-copy scan — on a mostly-ASCII corpus the expression is a
  * byte scan, not a decode/normalize/encode round trip.
  */
object UnicodeNorm {

  /** NFC-normalize (called from generated code). */
  def nfc(text: UTF8String): UTF8String = {
    if (isAscii(text)) text
    else UTF8String.fromString(java.text.Normalizer.normalize(
      text.toString, java.text.Normalizer.Form.NFC))
  }

  private def isAscii(s: UTF8String): Boolean = {
    val n = s.numBytes
    var i = 0
    while (i < n) {
      if ((s.getByte(i) & 0x80) != 0) return false
      i += 1
    }
    true
  }

  /** Column API. */
  def nfc(text: Column): Column =
    ColumnBridge.column(NfcExpr(ColumnBridge.expression(text)))
}

/** See [[UnicodeNorm.nfc]]. */
case class NfcExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string column, got ${child.dataType.sql}")

  override def nullSafeEval(t: Any): Any =
    UnicodeNorm.nfc(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNorm.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcExpr =
    copy(child = newChild)
}
