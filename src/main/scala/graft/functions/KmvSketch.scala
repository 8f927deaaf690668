package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** K-minimum-values distinct-count sketch as a typed [[Aggregator]]
  * (the checklist's UDAF surface, SURVEY.md §2.2).
  *
  * The sketch keeps the k smallest DISTINCT 60-bit hashes of the values
  * seen; with U(k) = the k-th smallest hash normalized to the 2^60 hash
  * space, the classic unbiased estimate is `(k-1) / U(k)` (Bar-Yossef et
  * al., "Counting distinct elements in a data stream", RANDOM 2002 —
  * same family as the KMV/bottom-k sketch HLL descends from). Under k
  * distinct values the sketch holds ALL hashes and the estimate is exact.
  *
  * Why this exists next to Spark's `approx_count_distinct` (q29): the
  * buffer is a plain sorted long array with a commutative, associative
  * merge — Spark computes it with map-side partial aggregation and a
  * k-sized shuffle row per group, the same scale shape as HLL — AND the
  * estimate is deterministic + engine-portable (md5-derived hashes), so
  * the DuckDB oracle can replay it bit-for-bit, which no HLL
  * implementation pair can (q36 is hash-checked; q29 stays rows-only).
  *
  * Input contract: the 60-bit hash (e.g. `PortableHash.hash60Base`), not
  * the raw value — hashing stays in codegen'd column space; NULL hashes
  * (NULL inputs) are ignored, matching COUNT(DISTINCT col).
  */
class KmvSketch(k: Int) extends Aggregator[java.lang.Long, Array[Long], Double]
    with Serializable {

  require(k >= 2, "k >= 2")

  override def zero: Array[Long] = Array.emptyLongArray

  /** Insert into the sorted bounded buffer (skip duplicates; evict the
    * max when full). k is small (<=256): binary search + arraycopy.
    */
  override def reduce(buf: Array[Long], h: java.lang.Long): Array[Long] = {
    if (h == null) return buf
    val v = h.longValue()
    val pos = java.util.Arrays.binarySearch(buf, v)
    if (pos >= 0) return buf // already present
    val ins = -pos - 1
    if (buf.length < k) {
      val out = new Array[Long](buf.length + 1)
      System.arraycopy(buf, 0, out, 0, ins)
      out(ins) = v
      System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
      out
    } else if (ins < k) {
      // v displaces the current maximum
      val out = new Array[Long](k)
      System.arraycopy(buf, 0, out, 0, ins)
      out(ins) = v
      System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
      out
    } else buf
  }

  /** Sorted-merge two buffers, distinct, keep the k smallest. */
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[Long](math.min(k, a.length + b.length))
    var i = 0; var j = 0; var n = 0
    while (n < k && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
        else { val x = b(j); j += 1; x }
      if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  /** Exact count below k distinct; `(k-1) * 2^60 / h_(k)` once saturated. */
  override def finish(buf: Array[Long]): Double =
    if (buf.length < k) buf.length.toDouble
    else (k - 1).toDouble * KmvSketch.HashSpace / buf(k - 1).toDouble

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Double] = ExpressionEncoder[Double]()
}

/** Sketch-VALUED aggregate: emits the sorted bottom-k hash buffer
  * itself instead of the estimate — the materializable half of the
  * rollup algebra. A 100 TB pipeline aggregates raw data once into
  * fine-grained partial sketches (per day / per partition), persists
  * them, and answers coarser distinct-counts by merging sketches with
  * [[KmvMergeEstimate]] — never re-scanning the raw data. Bottom-k
  * merge is LOSSLESS (the k smallest of a union are among the union of
  * per-part k smallest), so the rolled-up estimate equals the
  * direct-over-raw estimate exactly.
  */
class KmvBuffer(k: Int)
    extends Aggregator[java.lang.Long, Array[Long], Array[Long]]
    with Serializable {
  private val inner = new KmvSketch(k)
  override def zero: Array[Long] = inner.zero
  override def reduce(buf: Array[Long], h: java.lang.Long): Array[Long] =
    inner.reduce(buf, h)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    inner.merge(a, b)
  override def finish(buf: Array[Long]): Array[Long] = buf
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

/** Merge persisted KMV sketch buffers (sorted bottom-k arrays from
  * [[KmvBuffer]]) and finish to the distinct-count estimate.
  */
class KmvMergeEstimate(k: Int)
    extends Aggregator[Array[Long], Array[Long], Double]
    with Serializable {
  private val inner = new KmvSketch(k)
  override def zero: Array[Long] = inner.zero
  override def reduce(buf: Array[Long], sk: Array[Long]): Array[Long] =
    if (sk == null) buf else inner.merge(buf, sk)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    inner.merge(a, b)
  override def finish(buf: Array[Long]): Double = inner.finish(buf)
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Double] = ExpressionEncoder[Double]()
}

object KmvSketch {

  /** 2^60 — the [[PortableHash.hash60Base]] value space. */
  val HashSpace: Double = 1152921504606846976.0d

  /** Column aggregate: KMV distinct-count estimate over a 60-bit hash
    * column. DuckDB replay (identical arithmetic):
    * `CASE WHEN COUNT(DISTINCT h) < k THEN COUNT(DISTINCT h)::DOUBLE
    *       ELSE (k-1)::DOUBLE * 2^60 / (k-th smallest distinct h) END`.
    */
  def kmvEstimate(hash: Column, k: Int): Column = udaf(new KmvSketch(k))
    .apply(hash)

  /** Partial sketch (sorted bottom-k hash array) — persist + roll up. */
  def kmvBuffer(hash: Column, k: Int): Column = udaf(new KmvBuffer(k))
    .apply(hash)

  /** Merge partial sketches upward and finish to the estimate. */
  def kmvMergeEstimate(sketch: Column, k: Int): Column =
    udaf(new KmvMergeEstimate(k)).apply(sketch)
}
