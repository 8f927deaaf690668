package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Frequency-based charset SNIFFING for the unlabeled page — the last
  * leg of the effective-charset lattice (BOM → header → meta →
  * **sniff** → UTF-8 default): a legacy page with NO label at all used
  * to fall straight to lenient UTF-8 and surface as U+FFFD mojibake.
  * This is the chardet posture made DETERMINISTIC and
  * oracle-replayable:
  *
  *  1. no byte ≥ 0x80 → `''` (pure ASCII — the default is already
  *     correct);
  *  2. the whole buffer parses as STRICT UTF-8 with at least one
  *     multibyte sequence → `utf-8`;
  *  3. otherwise the maximal runs of high bytes (≥ 0x80) are split
  *     into CONSECUTIVE PAIRS and scored under each legacy CJK codec's
  *     validity ranges and script-frequency weights (common-script
  *     lead rows score high — kana for the Japanese codecs, the
  *     GB2312/KSC/Big5 common areas for the others, the UHC-extended
  *     rows as characteristically Korean); a codec is a candidate only
  *     if EVERY pair is valid under it; the highest score wins, ties
  *     break in the fixed order shift_jis < euc-jp < gbk < big5 <
  *     euc-kr;
  *  4. no valid candidate (odd-length runs, out-of-range pairs) →
  *     `''` — the lenient-UTF-8 default, whose U+FFFD output stays
  *     visible downstream. Never loud: sniffing is a last resort by
  *     construction.
  *
  * DOCUMENTED SIMPLIFICATIONS (the same shape real chardet has, made
  * explicit): ASCII-range trail bytes (Shift_JIS/GBK/Big5 low trails)
  * and Shift_JIS half-width-katakana singles are not modeled — a high
  * byte followed by ASCII simply yields no candidate and falls to the
  * default. Detection quality is a heuristic everywhere; what is exact
  * is the DECISION PROCEDURE, which the q301 oracle replays per
  * document from plant counts alone.
  */
object Sniff {

  private def validSjis(b1: Int, b2: Int): Boolean =
    ((b1 >= 0x81 && b1 <= 0x9F) || (b1 >= 0xE0 && b1 <= 0xFC)) &&
      (b2 >= 0x40 && b2 <= 0xFC && b2 != 0x7F)
  private def validEucJp(b1: Int, b2: Int): Boolean =
    b1 >= 0xA1 && b1 <= 0xFE && b2 >= 0xA1 && b2 <= 0xFE
  private def validGbk(b1: Int, b2: Int): Boolean =
    b1 >= 0x81 && b1 <= 0xFE && b2 >= 0x40 && b2 <= 0xFE && b2 != 0x7F
  private def validBig5(b1: Int, b2: Int): Boolean =
    b1 >= 0x81 && b1 <= 0xFE &&
      ((b2 >= 0x40 && b2 <= 0x7E) || (b2 >= 0xA1 && b2 <= 0xFE))
  private def validEucKr(b1: Int, b2: Int): Boolean =
    b1 >= 0x81 && b1 <= 0xFE &&
      ((b2 >= 0x41 && b2 <= 0x5A) || (b2 >= 0x61 && b2 <= 0x7A) ||
        (b2 >= 0x81 && b2 <= 0xFE))

  // script-frequency weight of one pair under each codec; -1 = invalid
  private def wSjis(b1: Int, b2: Int): Int =
    if (!validSjis(b1, b2)) -1
    else if (b1 >= 0x82 && b1 <= 0x83) 4 // kana rows
    else if (b1 >= 0x88 && b1 <= 0x9F) 3 // JIS level-1 kanji
    else 1
  private def wEucJp(b1: Int, b2: Int): Int =
    if (!validEucJp(b1, b2)) -1
    else if (b1 >= 0xA4 && b1 <= 0xA5) 4 // kana rows
    else if (b1 >= 0xB0 && b1 <= 0xCF) 3 // level-1 kanji
    else 1
  private def wGbk(b1: Int, b2: Int): Int =
    if (!validGbk(b1, b2)) -1
    else if (b1 >= 0xB0 && b1 <= 0xF7 && b2 >= 0xA1) 3 // GB2312 hanzi
    else 1
  private def wBig5(b1: Int, b2: Int): Int =
    if (!validBig5(b1, b2)) -1
    else if (b1 >= 0xA4 && b1 <= 0xC6) 3 // common hanzi area
    else 1
  private def wEucKr(b1: Int, b2: Int): Int =
    if (!validEucKr(b1, b2)) -1
    else if (b1 >= 0xB0 && b1 <= 0xC8 && b2 >= 0xA1) 3 // KSC hangul
    else if (b1 >= 0x81 && b1 <= 0xA0) 3 // UHC-extended hangul
    else 1

  private val Names =
    Array("shift_jis", "euc-jp", "gbk", "big5", "euc-kr")

  /** Strict UTF-8 validity; returns true only if the whole buffer
    * parses AND contains at least one multibyte sequence.
    */
  private def strictUtf8Multibyte(d: Array[Byte]): Boolean = {
    var i = 0
    var multibyte = false
    while (i < d.length) {
      val b = d(i) & 0xff
      if (b < 0x80) i += 1
      else {
        val n =
          if (b >= 0xC2 && b <= 0xDF) 1
          else if (b >= 0xE0 && b <= 0xEF) 2
          else if (b >= 0xF0 && b <= 0xF4) 3
          else return false
        if (i + n >= d.length) return false
        var k = 1
        while (k <= n) {
          val c = d(i + k) & 0xff
          if (c < 0x80 || c > 0xBF) return false
          k += 1
        }
        // reject overlong/surrogate/out-of-range forms
        if (b == 0xE0 && (d(i + 1) & 0xff) < 0xA0) return false
        if (b == 0xED && (d(i + 1) & 0xff) > 0x9F) return false
        if (b == 0xF0 && (d(i + 1) & 0xff) < 0x90) return false
        if (b == 0xF4 && (d(i + 1) & 0xff) > 0x8F) return false
        multibyte = true
        i += n + 1
      }
    }
    multibyte
  }

  /** The sniffing decision; returns a canonical charset label
    * ([[graft.sources.Warc.decodeBody]] routes it) or `''`.
    */
  def detect(data: Array[Byte]): UTF8String = {
    var anyHigh = false
    var i = 0
    while (i < data.length && !anyHigh) {
      if ((data(i) & 0x80) != 0) anyHigh = true
      i += 1
    }
    if (!anyHigh) return UTF8String.EMPTY_UTF8
    if (strictUtf8Multibyte(data)) return UTF8String.fromString("utf-8")
    // score high-byte runs pairwise under each codec
    val scores = new Array[Long](5)
    val valid = Array.fill(5)(true)
    var pairs = 0
    i = 0
    val n = data.length
    while (i < n) {
      if ((data(i) & 0x80) == 0) i += 1
      else {
        var j = i
        while (j < n && (data(j) & 0x80) != 0) j += 1
        // run [i, j): consecutive pairs; odd length invalidates all
        if (((j - i) & 1) == 1) { var c = 0; while (c < 5) { valid(c) = false; c += 1 } }
        else {
          var p = i
          while (p < j) {
            val b1 = data(p) & 0xff
            val b2 = data(p + 1) & 0xff
            pairs += 1
            val w = Array(wSjis(b1, b2), wEucJp(b1, b2), wGbk(b1, b2),
              wBig5(b1, b2), wEucKr(b1, b2))
            var c = 0
            while (c < 5) {
              if (w(c) < 0) valid(c) = false else scores(c) += w(c)
              c += 1
            }
            p += 2
          }
        }
        i = j
      }
    }
    if (pairs == 0) return UTF8String.EMPTY_UTF8
    var best = -1
    var bestScore = -1L
    var c = 0
    while (c < 5) {
      if (valid(c) && scores(c) > bestScore) { best = c; bestScore = scores(c) }
      c += 1
    }
    if (best < 0) UTF8String.EMPTY_UTF8
    else UTF8String.fromString(Names(best))
  }
}

/** Codegen charset-sniff expression over entity BYTES; '' when the
  * sniff abstains (the effective-charset lattice falls through to the
  * lenient-UTF-8 default).
  */
case class CharsetSniff(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "charset_sniff"
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(a: Any): Any =
    Sniff.detect(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.Sniff.detect($c);
     """.stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): CharsetSniff = copy(child = newChild)
}

object SniffCols {
  def sniffCol(bytes: Column): Column =
    ColumnBridge.column(CharsetSniff(ColumnBridge.expression(bytes)))
}
