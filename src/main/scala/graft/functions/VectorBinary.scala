package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Codec expressions for the QUANTIZED VECTOR artifact
  * ([[graft.similarity.VectorStore.exportVectors]]): int8 components
  * packed one byte each into a `binary` cell per vector — the 4×
  * size cut every embedding store ships (faiss `SQ8`, the PQ
  * codebooks' storage shape), carried through Spark as ordinary binary
  * columns so the artifact rides the catalog's atomic parquet publish.
  *
  * Same design as [[TokenBinary]]: native codegen expressions calling
  * static helpers — a corpus-sized quantize-and-pack scan must not pay
  * interpreted-lambda dispatch per COMPONENT.
  */
case class I8sToBinary(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "i8s_to_binary"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    VectorBinary.packI8(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.VectorBinary.packI8($c);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): I8sToBinary = copy(child = newChild)
}

/** Inverse of [[I8sToBinary]]: each byte sign-extends back to an int.
  * Any byte length is a valid buffer (one component per byte), so
  * unlike [[BinaryToInts]] there is no torn-buffer case.
  */
case class BinaryToI8s(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "binary_to_i8s"
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(a: Any): Any =
    VectorBinary.unpackI8(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.VectorBinary.unpackI8($c);
     """.stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): BinaryToI8s = copy(child = newChild)
}

/** Order-pinning checksum of a packed int8 buffer: Σ (i+1)·b_i over
  * the SIGNED bytes, in long — the [[BinaryI32WeightedSum]] contract
  * at byte width, so a read-back of the exported vector artifact is
  * verifiable against DuckDB's replay of the quantization formula
  * without the oracle ever seeing a byte of binary. Bounds: |b| ≤ 127,
  * weight ≤ dims — microscopic next to int64.
  */
case class BinaryI8WeightedSum(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "binary_i8_weighted_sum"
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(a: Any): Any =
    VectorBinary.weightedSumI8(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.VectorBinary.weightedSumI8($c);
     """.stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): BinaryI8WeightedSum = copy(child = newChild)
}

object VectorBinary {

  /** One signed byte per component; NULL if any component falls
    * outside int8 range — a foreign or mis-scaled input must surface,
    * not wrap around to a plausible byte.
    */
  def packI8(arr: ArrayData): Array[Byte] = {
    val n = arr.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val v = arr.getInt(i)
      if (v < -128 || v > 127) return null
      out(i) = v.toByte
      i += 1
    }
    out
  }

  /** Sign-extending unpack (called from eval and codegen). */
  def unpackI8(bytes: Array[Byte]): ArrayData = {
    val n = bytes.length
    val out = new Array[Int](n)
    var i = 0
    while (i < n) { out(i) = bytes(i).toInt; i += 1 }
    new GenericArrayData(out)
  }

  /** Σ (i+1)·b_i over signed bytes, in long. */
  def weightedSumI8(bytes: Array[Byte]): Long = {
    var acc = 0L
    var i = 0
    while (i < bytes.length) { acc += (i + 1).toLong * bytes(i); i += 1 }
    acc
  }

  def packI8Col(ints: Column): Column =
    ColumnBridge.column(I8sToBinary(ColumnBridge.expression(ints)))

  def unpackI8Col(bytes: Column): Column =
    ColumnBridge.column(BinaryToI8s(ColumnBridge.expression(bytes)))

  def weightedSumI8Col(bytes: Column): Column =
    ColumnBridge.column(BinaryI8WeightedSum(ColumnBridge.expression(bytes)))
}
