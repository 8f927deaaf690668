package graft.functions

import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Trained language-ID scoring as ONE referenced-object codegen
  * expression — the scale path of
  * [[graft.text.LangClassifier.classify]].
  *
  * The relational formulation (explode every trigram occurrence ×
  * labels, broadcast-join the weight table, per-(doc,label) sum, then
  * a per-doc min-struct) SHUFFLES the whole trigram stream on doc id —
  * ~text-length rows per document through an exchange. The model is
  * VOCABULARY-sized (≤ |alphabet|³ trigrams × labels), so it rides
  * along as a referenced object (the [[CentroidOps]]/[[RobotRules]]
  * mechanism) and the per-row work is one text walk accumulating every
  * label's cost — no explode, no join, no shuffle: the gate rides the
  * scan.
  *
  * Determinism contract (so the swap is invisible to the
  * `classifyCtes` oracle and bit-equal to the relational path):
  * trigrams are CODEPOINT substrings (Spark `substring` semantics),
  * integer weight sums in label-index order over labels pre-sorted by
  * UTF-8 bytes (= Spark's binary string ordering), argmin keeps the
  * FIRST minimum — exactly `min(struct(cost, label))`.
  */
object LangScore {

  /** Frozen native model: `labels` sorted ascending by UTF-8 bytes,
    * `defaults(i)` = label i's unseen-trigram cost, `weights` maps a
    * trigram to its per-label cost array (missing labels already
    * filled with their default at build time).
    */
  final class Model(val labels: Array[String],
      val defaults: Array[Long],
      val weights: java.util.HashMap[String, Array[Long]])
      extends Serializable {
    @transient lazy val labelUtf8: Array[UTF8String] =
      labels.map(UTF8String.fromString)
  }

  /** Build from the fitted relations' collected rows. */
  def build(labelDefaults: Seq[(String, Long)],
      triWeights: Seq[(String, String, Long)]): Model = {
    val sorted = labelDefaults.sortWith { case ((a, _), (b, _)) =>
      java.util.Arrays.compareUnsigned(a.getBytes(UTF_8),
        b.getBytes(UTF_8)) < 0
    }
    val labels = sorted.map(_._1).toArray
    val defaults = sorted.map(_._2).toArray
    val idx = labels.zipWithIndex.toMap
    val m = new java.util.HashMap[String, Array[Long]]()
    triWeights.foreach { case (label, tri, w) =>
      var arr = m.get(tri)
      if (arr == null) { arr = defaults.clone(); m.put(tri, arr) }
      arr(idx(label)) = w
    }
    new Model(labels, defaults, m)
  }

  /** One text walk, all labels: returns `(lang_trained, cost)` as an
    * InternalRow. Codepoint-substring trigrams (one O(n) offset pass,
    * then O(1) slices), first-minimum argmin over the sorted labels.
    */
  def score(t: UTF8String, m: Model): InternalRow = {
    val s = t.toString
    val k = m.labels.length
    val sums = new Array[Long](k)
    val n = s.codePointCount(0, s.length)
    if (n >= 3) {
      val offs = new Array[Int](n + 1)
      var ci = 0
      var o = 0
      while (ci < n) {
        offs(ci) = o
        o = s.offsetByCodePoints(o, 1)
        ci += 1
      }
      offs(n) = s.length
      var i = 0
      while (i + 3 <= n) {
        val w = m.weights.get(s.substring(offs(i), offs(i + 3)))
        if (w == null) {
          var j = 0
          while (j < k) { sums(j) += m.defaults(j); j += 1 }
        } else {
          var j = 0
          while (j < k) { sums(j) += w(j); j += 1 }
        }
        i += 1
      }
    }
    var best = 0
    var j = 1
    while (j < k) {
      if (sums(j) < sums(best)) best = j
      j += 1
    }
    new GenericInternalRow(Array[Any](m.labelUtf8(best), sums(best)))
  }

  def scoreCol(text: Column, m: Model): Column =
    ColumnBridge.column(LangScoreExpr(ColumnBridge.expression(text), m))
}

case class LangScoreExpr(child: Expression, model: LangScore.Model)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("lang_trained", StringType, nullable = false),
    StructField("cost", LongType, nullable = false)))
  override def prettyName: String = "lang_score"
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(t: Any): Any =
    LangScore.score(t.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("langModel", model,
      classOf[LangScore.Model].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.LangScore.score($c, $m);
     """.stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): LangScoreExpr = copy(child = newChild)
}
