package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** All-centroids argmin as ONE expression — the IVF scale path.
  *
  * The naive plan builds `c` literal dot-product subtrees plus an
  * array_sort over `c` structs; at coarse-quantizer sizes of c ≈ √N
  * (tens of thousands at 100 TB) that plan tree is a non-starter to
  * analyze, codegen, and ship to executors. Here the centroid matrix
  * rides along as a single referenced object (Catalyst `references`
  * array — the same mechanism broadcast scalar subquery results use),
  * the plan holds exactly ONE node regardless of `c`, and the per-row
  * work is a fused c×dims multiply-add loop in whole-stage codegen.
  *
  * Determinism contract (so the swap is invisible to the q42 oracle):
  * distances are `-2·(v·cent_i) + |cent_i|²` with the dot a strict
  * left fold and |cent|² the same Scala fold the literal path used;
  * selection returns the `nProbe` smallest by (distance, index) —
  * identical to `array_sort(struct(d, idx))` + slice, including the
  * lower-index tie-break. A vector whose length differs from a
  * centroid's ranks that centroid last (NaN sorts after every number,
  * matching Spark's double ordering).
  */
object CentroidOps {

  /** `nProbe` nearest centroid indices, ascending by (L2 rank key,
    * index). Selection loop is O(nProbe·c) — nProbe is small (≤ tens);
    * the c·dims distance pass dominates and is the part that must be
    * tight.
    */
  def nearest(v: ArrayData, cents: Array[Array[Double]], c2: Array[Double],
      nProbe: Int): ArrayData = {
    val dims = v.numElements()
    val c = cents.length
    val d = new Array[Double](c)
    var i = 0
    while (i < c) {
      val cent = cents(i)
      if (cent.length != dims) d(i) = Double.NaN
      else {
        var acc = 0.0
        var j = 0
        while (j < dims) { acc += v.getDouble(j) * cent(j); j += 1 }
        d(i) = -2.0 * acc + c2(i)
      }
      i += 1
    }
    val k = math.min(nProbe, c)
    val out = new Array[Int](k)
    val used = new Array[Boolean](c)
    var s = 0
    while (s < k) {
      var best = -1
      var t = 0
      while (t < c) {
        if (!used(t) && (best < 0 || java.lang.Double.compare(d(t), d(best)) < 0))
          best = t
        t += 1
      }
      used(best) = true
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Column wrapper: `nProbe` nearest centroid indices for an
    * `array<double>` vector column.
    */
  def nearestCol(e: Column, cents: Array[Array[Double]], nProbe: Int): Column =
    ColumnBridge.column(NearestCentroids(
      VectorFunctions.castToDoubleArray(ColumnBridge.expression(e)),
      cents, nProbe))

  /** Single-level argmin index by (rank key, index) — the inner loop of
    * both expressions.
    */
  def argmin(v: ArrayData, cents: Array[Array[Double]],
      c2: Array[Double]): Int = {
    val dims = v.numElements()
    var best = -1
    var bestD = Double.NaN
    var i = 0
    while (i < cents.length) {
      val cent = cents(i)
      val d =
        if (cent.length != dims) Double.NaN
        else {
          var acc = 0.0
          var j = 0
          while (j < dims) { acc += v.getDouble(j) * cent(j); j += 1 }
          -2.0 * acc + c2(i)
        }
      if (best < 0 || java.lang.Double.compare(d, bestD) < 0) {
        best = i; bestD = d
      }
      i += 1
    }
    best
  }

  /** Two-level (hierarchical) argmin: nearest of ~√c super-centroids,
    * then exact argmin within that super's child group, returning the
    * GLOBAL child index. Per-row work drops from c·dims to ~2√c·dims —
    * the assignment scan that dominates coarse quantization once
    * c ≈ √N. Approximate: a vector near a super-boundary can assign to
    * a neighboring cluster; byte-identical (and, after range
    * quantization, scale-identical) vectors still co-assign under any
    * deterministic rule, so dedup semantics survive (asserted in
    * SemanticDedupSpec).
    */
  def nearestHier(v: ArrayData, supers: Array[Array[Double]],
      s2: Array[Double], children: Array[Array[Array[Double]]],
      ch2: Array[Array[Double]], globalIdx: Array[Array[Int]]): Int = {
    val s = argmin(v, supers, s2)
    globalIdx(s)(argmin(v, children(s), ch2(s)))
  }

  /** Column wrapper for the two-level argmin (global centroid index). */
  def nearestHierCol(e: Column, supers: Array[Array[Double]],
      children: Array[Array[Array[Double]]],
      globalIdx: Array[Array[Int]]): Column =
    ColumnBridge.column(NearestCentroidHier(
      VectorFunctions.castToDoubleArray(ColumnBridge.expression(e)),
      supers, children, globalIdx))

  /** Two-level top-n: probe the `nProbe` nearest supers, then return
    * the `nProbe` best children ACROSS those supers' groups, ascending
    * by (rank key, global index) — hierarchical multi-probe, so
    * `nProbe >= 2` pair generation composes with the ~2√c·dims scan.
    * Approximate like [[nearestHier]] (children outside the probed
    * supers are never ranked); its first element is at least as close
    * as [[nearestHier]]'s single answer (same candidates plus more).
    */
  def nearestHierN(v: ArrayData, supers: Array[Array[Double]],
      s2: Array[Double], children: Array[Array[Array[Double]]],
      ch2: Array[Array[Double]], globalIdx: Array[Array[Int]],
      nProbe: Int): ArrayData = {
    val dims = v.numElements()
    val sTop = nearest(v, supers, s2, nProbe)
    var cand = 0
    var i = 0
    while (i < sTop.numElements()) {
      cand += children(sTop.getInt(i)).length; i += 1
    }
    val d = new Array[Double](cand)
    val gi = new Array[Int](cand)
    var w = 0
    i = 0
    while (i < sTop.numElements()) {
      val s = sTop.getInt(i)
      val grp = children(s)
      var k = 0
      while (k < grp.length) {
        val cent = grp(k)
        d(w) =
          if (cent.length != dims) Double.NaN
          else {
            var acc = 0.0
            var j = 0
            while (j < dims) { acc += v.getDouble(j) * cent(j); j += 1 }
            -2.0 * acc + ch2(s)(k)
          }
        gi(w) = globalIdx(s)(k)
        w += 1
        k += 1
      }
      i += 1
    }
    val n = math.min(nProbe, cand)
    val out = new Array[Int](n)
    val used = new Array[Boolean](cand)
    var sSel = 0
    while (sSel < n) {
      var best = -1
      var t = 0
      while (t < cand) {
        if (!used(t) && (best < 0 || {
          val c = java.lang.Double.compare(d(t), d(best))
          c < 0 || (c == 0 && gi(t) < gi(best))
        })) best = t
        t += 1
      }
      used(best) = true
      out(sSel) = gi(best)
      sSel += 1
    }
    new GenericArrayData(out)
  }

  /** Column wrapper for the two-level top-n (global centroid indices). */
  def nearestHierNCol(e: Column, supers: Array[Array[Double]],
      children: Array[Array[Array[Double]]],
      globalIdx: Array[Array[Int]], nProbe: Int): Column =
    ColumnBridge.column(NearestCentroidHierN(
      VectorFunctions.castToDoubleArray(ColumnBridge.expression(e)),
      supers, children, globalIdx, nProbe))
}

/** See [[CentroidOps]]. `cents` lives on the expression node (shipped
  * once per task via the references array), NOT in the expression tree.
  */
case class NearestCentroids(child: Expression, cents: Array[Array[Double]],
    nProbe: Int) extends UnaryExpression {

  require(cents.nonEmpty, "at least one centroid")
  require(nProbe >= 1, "nProbe >= 1")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_centroids"
  override def nullable: Boolean = child.nullable

  /** |cent|² per centroid — same Scala fold the literal-subtree path
    * computed at plan time, so rank keys are bit-identical.
    */
  @transient private lazy val c2: Array[Double] =
    cents.map(_.map(x => x * x).sum)

  override def nullSafeEval(v: Any): Any =
    CentroidOps.nearest(v.asInstanceOf[ArrayData], cents, c2, nProbe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    val c2Ref = ctx.addReferenceObj("c2", c2, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.CentroidOps.nearest($v, $centsRef, $c2Ref, $nProbe);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
}

/** See [[CentroidOps.nearestHier]]. Both centroid levels ride along as
  * referenced objects; the plan holds ONE node regardless of c.
  */
case class NearestCentroidHier(child: Expression,
    supers: Array[Array[Double]], subCents: Array[Array[Array[Double]]],
    globalIdx: Array[Array[Int]]) extends UnaryExpression {

  require(supers.nonEmpty && supers.length == subCents.length &&
    subCents.length == globalIdx.length, "aligned level arrays")
  require(subCents.forall(_.nonEmpty), "no empty child group")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid_hier"
  override def nullable: Boolean = child.nullable

  @transient private lazy val s2: Array[Double] =
    supers.map(_.map(x => x * x).sum)
  @transient private lazy val ch2: Array[Array[Double]] =
    subCents.map(_.map(_.map(x => x * x).sum))

  override def nullSafeEval(v: Any): Any =
    CentroidOps.nearestHier(v.asInstanceOf[ArrayData], supers, s2,
      subCents, ch2, globalIdx)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val supersRef = ctx.addReferenceObj("supers", supers, "double[][]")
    val s2Ref = ctx.addReferenceObj("s2", s2, "double[]")
    val chRef = ctx.addReferenceObj("subCents", subCents, "double[][][]")
    val ch2Ref = ctx.addReferenceObj("ch2", ch2, "double[][]")
    val giRef = ctx.addReferenceObj("globalIdx", globalIdx, "int[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.CentroidOps.nearestHier($v, $supersRef, $s2Ref, $chRef, $ch2Ref, $giRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidHier =
    copy(child = newChild)
}

/** See [[CentroidOps.nearestHierN]]. Same referenced-object layout as
  * [[NearestCentroidHier]], returning `nProbe` global indices.
  */
case class NearestCentroidHierN(child: Expression,
    supers: Array[Array[Double]], subCents: Array[Array[Array[Double]]],
    globalIdx: Array[Array[Int]], nProbe: Int) extends UnaryExpression {

  require(supers.nonEmpty && supers.length == subCents.length &&
    subCents.length == globalIdx.length, "aligned level arrays")
  require(subCents.forall(_.nonEmpty), "no empty child group")
  require(nProbe >= 1, "nProbe >= 1")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_centroid_hier_n"
  override def nullable: Boolean = child.nullable

  @transient private lazy val s2: Array[Double] =
    supers.map(_.map(x => x * x).sum)
  @transient private lazy val ch2: Array[Array[Double]] =
    subCents.map(_.map(_.map(x => x * x).sum))

  override def nullSafeEval(v: Any): Any =
    CentroidOps.nearestHierN(v.asInstanceOf[ArrayData], supers, s2,
      subCents, ch2, globalIdx, nProbe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val supersRef = ctx.addReferenceObj("supers", supers, "double[][]")
    val s2Ref = ctx.addReferenceObj("s2", s2, "double[]")
    val chRef = ctx.addReferenceObj("subCents", subCents, "double[][][]")
    val ch2Ref = ctx.addReferenceObj("ch2", ch2, "double[][]")
    val giRef = ctx.addReferenceObj("globalIdx", globalIdx, "int[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.CentroidOps.nearestHierN($v, $supersRef, $s2Ref, $chRef, $ch2Ref, $giRef, $nProbe);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidHierN =
    copy(child = newChild)
}
