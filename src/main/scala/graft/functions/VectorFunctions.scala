package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native dot product over two `array<double>` columns.
  *
  * Spark's higher-order functions (`aggregate`/`zip_with`) are
  * CodegenFallback — every row pays interpreted-lambda dispatch, which is
  * the difference between ~1s and ~80s on a few million 64-dim pairs. This
  * expression generates a tight primitive loop inside whole-stage codegen
  * instead (preference order of SURVEY §7.5: custom `Expression` before
  * UDF).
  *
  * Determinism contract: the sum is strict left-to-right over element
  * index — the exact same IEEE operation sequence as
  * `aggregate(zip_with(a,b,(x,y)=>x*y), 0d, (acc,v)=>acc+v)` and as the
  * DuckDB `list_reduce` oracle replay, so results stay bit-identical.
  * Null array elements are treated as 0 contribution is NOT supported —
  * inputs must be non-null-element arrays (embedding columns are).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // callers must pre-cast both sides to array<double> (asDouble does)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  // length mismatch -> NULL, matching SQL semantics (the DuckDB oracle's
  // generate_series-over-len(a) indexing b[i] yields NULL) instead of a
  // plausible partial sum that would mask malformed vectors
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Native dot product over two `array<int>` columns, accumulating in
  * long — the per-pair kernel of quantized (int8-range) similarity
  * search. Integer arithmetic is exact, so quantized scores are
  * bit-reproducible in any engine (the portability md5 buys for hashes,
  * quantization buys for vector math). Max |element| 127 at 64 dims
  * keeps `dot` < 2^21 and norms' product < 2^42 — no overflow anywhere
  * near int64. Same null/length contract as [[DotProduct]].
  */
/** Native int8-range quantization of an `array<double>` column — ONE
  * codegen call per row where the composed
  * `transform(e, x -> round(x*127/max|x|))` formulation is
  * CodegenFallback (interpreted lambda dispatch per ELEMENT: ~140µs/row
  * at 64 dims, which made the quantize scan the dominant cost of every
  * quantized-ANN build at scale). Semantics are bit-identical to the
  * composed form — see [[VectorFunctions.quantInt8]]. NULL for all-zero
  * vectors, replacing the `mab > 0` filter.
  */
case class Int8Quantize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "int8_quantize"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    VectorFunctions.quantInt8(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.VectorFunctions.quantInt8($c);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): Int8Quantize = copy(child = newChild)
}

case class IntDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "int_dot_product"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getInt(i).toLong * y.getInt(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (long) $a.getInt($i) * $b.getInt($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntDotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {

  /** Codegen'd dot product; see [[DotProduct]]. Inputs are cast to
    * `array<double>` here so arbitrary numeric arrays (e.g. from SQL via
    * `graft_dot`) are converted instead of being misread by `getDouble`.
    */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      castToDoubleArray(ColumnBridge.expression(a)),
      castToDoubleArray(ColumnBridge.expression(b))))

  /** Codegen'd integer dot product; see [[IntDotProduct]]. */
  def dotInt(a: Column, b: Column): Column =
    ColumnBridge.column(IntDotProduct(
      castToIntArray(ColumnBridge.expression(a)),
      castToIntArray(ColumnBridge.expression(b))))

  /** Codegen'd int8-range quantization; see [[Int8Quantize]]. */
  def quantInt8Col(v: Column): Column =
    ColumnBridge.column(Int8Quantize(
      castToDoubleArray(ColumnBridge.expression(v))))

  /** One-pass int8-range quantization of an `array<double>`:
    * `q_i = round(x_i * 127 / max|x|)` with EXACTLY Spark's
    * `round(double)` semantics (shortest-decimal BigDecimal, HALF_UP —
    * the same operation DuckDB's `round` performs, which is what keeps
    * q42/q66/q92 hash-identical) followed by the double→int cast's
    * truncation. Returns null for all-zero vectors (the quantize
    * pipeline's `mab > 0` gate). Called from both interpreted eval and
    * generated code.
    */
  def quantInt8(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    var mab = 0.0
    var i = 0
    while (i < n) {
      val v = math.abs(arr.getDouble(i))
      if (v > mab) mab = v
      i += 1
    }
    if (!(mab > 0)) return null
    val out = new Array[Int](n)
    i = 0
    while (i < n) {
      val x = arr.getDouble(i) * 127.0 / mab
      // mirror Spark Round(double, 0): NaN/Inf pass through (then the
      // int cast truncates them exactly as Cast would)
      val r = if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
        else java.math.BigDecimal.valueOf(x)
          .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
      out(i) = r.toInt
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  private[graft] def castToIntArray(
      e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.catalyst.expressions.Cast(
      e, org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.IntegerType))

  private[graft] def castToDoubleArray(
      e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.catalyst.expressions.Cast(
      e, org.apache.spark.sql.types.ArrayType(DoubleType))
}
