package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi segmentation under a unigram-LM piece inventory — the apply
  * kernel of the SentencePiece-style tokenizer ([[graft.text.Unigram]]).
  * One expression node; the piece→cost table rides along as a
  * referenced object (the [[CentroidOps]] mechanism), so the plan size
  * is O(1) in the inventory and the per-row work is a fused DP loop in
  * whole-stage codegen.
  *
  * Determinism contract (the DuckDB recursive-CTE replay is
  * bit-identical): integer piece costs; the DP minimizes
  * `(total cost, piece count, last-piece length)` lexicographically
  * with length ASCENDING on full ties; positions are UNICODE CODE
  * POINTS (both engines' `substr`/`length` semantics); unknown single
  * characters cost `unkCost` (coverage is total — every word
  * segments); `INF = 2^40` exceeds any reachable path cost yet never
  * overflows when two INFs add.
  */
object UnigramOps {

  val Inf: Long = 1099511627776L // 2^40 — same literal in the oracle SQL

  /** Viterbi-segment one word. See object doc for the exact contract. */
  def segment(word: UTF8String, costs: java.util.HashMap[String, Integer],
      maxLen: Int, unkCost: Int): ArrayData = {
    val cps = word.toString.codePoints().toArray
    val n = cps.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val cost = new Array[Long](n + 1)
    val pieces = new Array[Int](n + 1)
    val choice = new Array[Int](n + 1)
    var i = 1
    while (i <= n) { cost(i) = Inf; i += 1 }
    i = 1
    while (i <= n) {
      var bestC = Long.MaxValue / 2
      var bestP = Int.MaxValue
      var bestL = 0
      var l = 1
      val lMax = math.min(maxLen, i)
      while (l <= lMax) {
        if (cost(i - l) < Inf) {
          val pc = costs.get(new String(cps, i - l, l))
          val k: Long =
            if (pc != null) pc.longValue()
            else if (l == 1) unkCost.toLong
            else Inf
          if (k < Inf) {
            val c = cost(i - l) + k
            val p = pieces(i - l) + 1
            // l ascends, so strictly-less keeps the SMALLEST l on full
            // (cost, pieces) ties — the oracle CASE chain's tie-break
            if (c < bestC || (c == bestC && p < bestP)) {
              bestC = c; bestP = p; bestL = l
            }
          }
        }
        l += 1
      }
      // bestL is always set: l = 1 is valid whenever cost(i-1) < Inf,
      // and cost(i-1) < Inf holds inductively from cost(0) = 0
      cost(i) = bestC
      pieces(i) = bestP
      choice(i) = bestL
      i += 1
    }
    val out = new Array[Any](pieces(n))
    var at = n
    var slot = pieces(n) - 1
    while (at > 0) {
      val l = choice(at)
      out(slot) = UTF8String.fromString(new String(cps, at - l, l))
      slot -= 1
      at -= l
    }
    new GenericArrayData(out)
  }

  /** Column wrapper: segmentation of a string column as
    * `array<string>` of pieces.
    */
  def segmentCol(e: Column, costs: Map[String, Int], maxLen: Int,
      unkCost: Int): Column = {
    val jmap = new java.util.HashMap[String, Integer]()
    costs.foreach { case (k, v) => jmap.put(k, Integer.valueOf(v)) }
    ColumnBridge.column(UnigramSegment(
      ColumnBridge.expression(e), jmap, maxLen, unkCost))
  }
}

/** See [[UnigramOps]]. The cost table lives on the expression node
  * (shipped once per task via the references array), NOT in the
  * expression tree.
  */
case class UnigramSegment(child: Expression,
    costs: java.util.HashMap[String, Integer], maxLen: Int, unkCost: Int)
  extends UnaryExpression {

  require(maxLen >= 1, "maxLen >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_segment"
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(w: Any): Any =
    UnigramOps.segment(w.asInstanceOf[UTF8String], costs, maxLen, unkCost)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val costsRef = ctx.addReferenceObj("pieceCosts", costs, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, w =>
      s"${ev.value} = graft.functions.UnigramOps.segment($w, $costsRef, $maxLen, $unkCost);")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramSegment =
    copy(child = newChild)
}
