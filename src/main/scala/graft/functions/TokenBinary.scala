package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Codec expressions for the BINARY TOKEN-STREAM export
  * ([[graft.pipeline.Packing.exportShards]]): fixed-width little-endian
  * int32 token ids packed into one `binary` cell per training sequence —
  * the Megatron-LM `.bin` record shape (one sequence = `n_tok × 4`
  * bytes), carried through Spark as ordinary binary columns so the
  * artifact rides the catalog's atomic parquet publish.
  *
  * All three are native codegen expressions calling static helpers
  * (the [[VectorFunctions.quantInt8]] idiom) — a sequence is up to a
  * few thousand tokens, and the composed higher-order-function
  * formulation would pay interpreted-lambda dispatch per TOKEN over the
  * whole corpus.
  */
case class IntsToBinary(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "ints_to_binary"
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(a: Any): Any =
    TokenBinary.pack(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.TokenBinary.pack($c);
     """.stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): IntsToBinary = copy(child = newChild)
}

/** Inverse of [[IntsToBinary]]: NULL if the byte length is not a
  * multiple of 4 (a torn or foreign buffer must surface, not decode to
  * a plausible prefix).
  */
case class BinaryToInts(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "binary_to_ints"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    TokenBinary.unpack(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.TokenBinary.unpack($c);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): BinaryToInts = copy(child = newChild)
}

/** Order-pinning checksum of a packed buffer: Σ (i+1)·id_i over the
  * int32s, in long — exactly `SUM((off+1) * tid)` of the oracle's
  * token-tape replay, so a read-back of the exported artifact is
  * verifiable against DuckDB WITHOUT the oracle ever seeing a byte of
  * binary (q171). A plain sum would pass under transposition; the
  * positional weight pins both content and order. Bounds: weight ≤
  * seqLen (2048 = 2^11), id < 2^31 → term < 2^42, seqLen terms → the
  * per-sequence sum stays under 2^53, exact in int64 (and in DuckDB's
  * BIGINT). NULL on torn buffers, like [[BinaryToInts]].
  */
case class BinaryI32WeightedSum(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "binary_i32_weighted_sum"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    TokenBinary.weightedSum(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |Long ${ev.value}_b = graft.functions.TokenBinary.weightedSum($c);
       |${ev.isNull} = ${ev.value}_b == null;
       |${ev.value} = ${ev.isNull} ? -1L : ${ev.value}_b.longValue();
     """.stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): BinaryI32WeightedSum = copy(child = newChild)
}

object TokenBinary {

  /** Little-endian int32 packing (called from eval and codegen). */
  def pack(arr: ArrayData): Array[Byte] = {
    val n = arr.numElements()
    val out = new Array[Byte](n * 4)
    var i = 0
    while (i < n) {
      val v = arr.getInt(i)
      val o = i * 4
      out(o) = v.toByte
      out(o + 1) = (v >>> 8).toByte
      out(o + 2) = (v >>> 16).toByte
      out(o + 3) = (v >>> 24).toByte
      i += 1
    }
    out
  }

  /** Little-endian int32 unpacking; null unless length % 4 == 0. */
  def unpack(bytes: Array[Byte]): ArrayData = {
    if (bytes.length % 4 != 0) return null
    val n = bytes.length / 4
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      val o = i * 4
      out(i) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
        ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Σ (i+1)·id_i in long; null unless length % 4 == 0. Boxed so the
    * generated code can branch on null.
    */
  def weightedSum(bytes: Array[Byte]): java.lang.Long = {
    if (bytes.length % 4 != 0) return null
    val n = bytes.length / 4
    var acc = 0L
    var i = 0
    while (i < n) {
      val o = i * 4
      val v = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
        ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
      acc += (i + 1).toLong * v
      i += 1
    }
    acc
  }

  def packCol(ids: Column): Column =
    ColumnBridge.column(IntsToBinary(ColumnBridge.expression(ids)))

  def unpackCol(bytes: Column): Column =
    ColumnBridge.column(BinaryToInts(ColumnBridge.expression(bytes)))

  def weightedSumCol(bytes: Column): Column =
    ColumnBridge.column(BinaryI32WeightedSum(ColumnBridge.expression(bytes)))
}
