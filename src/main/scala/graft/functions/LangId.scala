package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass native language ID.
  *
  * Replays EXACTLY the marker-count argmax of
  * [[graft.text.TextAnalysis.langId]] (and the q17 DuckDB oracle): for
  * each language, the number of `\b(marker|...)\b` matches in
  * lower(text), ties broken in language order, zero hits -> "und". The
  * regex formulation scans the text once per language; this expression
  * walks it once TOTAL, splitting on the same word-character class the
  * regexes use (`\b` is defined by `\w` = ASCII [A-Za-z0-9_] in both
  * Java regex and RE2), lowercasing ASCII on the fly, and testing each
  * maximal word run against per-language marker sets.
  */
object LangIdNative {

  import graft.text.TextAnalysis.langMarkers

  private val codes: Array[UTF8String] =
    langMarkers.map(m => UTF8String.fromString(m._1)).toArray
  private val Und = UTF8String.fromString("und")

  // marker -> bitmask of languages containing it (markers are distinct
  // per language here, but a shared marker would legitimately count for
  // both — exactly as the independent regex scans would)
  private val markerLangs: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    langMarkers.zipWithIndex.foreach { case ((_, words), li) =>
      words.foreach { w =>
        m.merge(w, Integer.valueOf(1 << li), (a, b) =>
          Integer.valueOf(a.intValue | b.intValue))
      }
    }
    m
  }
  private val maxMarkerLen = langMarkers.flatMap(_._2).map(_.length).max

  @inline private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  /** Predicted language code (called from generated code). */
  def langId(text: UTF8String): UTF8String = {
    val s = text.toString
    val counts = new Array[Int](codes.length)
    val sb = new java.lang.StringBuilder(maxMarkerLen)
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && !isWordChar(s.charAt(i))) i += 1
      val start = i
      sb.setLength(0)
      while (i < len && isWordChar(s.charAt(i))) {
        if (i - start < maxMarkerLen) {
          val c = s.charAt(i)
          sb.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
        }
        i += 1
      }
      if (i - start <= maxMarkerLen && i > start) {
        val langs = markerLangs.get(sb.toString)
        if (langs != null) {
          var li = 0
          while (li < counts.length) {
            if ((langs.intValue & (1 << li)) != 0) counts(li) += 1
            li += 1
          }
        }
      }
    }
    var best = 0
    var bestIdx = -1
    var li = 0
    while (li < counts.length) {
      if (counts(li) > best) { best = counts(li); bestIdx = li }
      li += 1
    }
    if (bestIdx < 0) Und else codes(bestIdx)
  }

  /** Column API. */
  def langId(text: Column): Column =
    ColumnBridge.column(LangIdExpr(ColumnBridge.expression(text)))
}

/** See [[LangIdNative.langId]]. */
case class LangIdExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string column, got ${child.dataType.sql}")

  override def nullSafeEval(t: Any): Any =
    LangIdNative.langId(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LangIdNative.langId($c)")

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}
