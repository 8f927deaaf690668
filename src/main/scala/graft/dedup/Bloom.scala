package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Bloom-filter membership at corpus scale — the JOIN-FREE form of
  * benchmark decontamination (q84 is the join form).
  *
  * A 100 TB decontamination pass cannot afford to shuffle the training
  * corpus against every evaluation set it must be screened for. The
  * Bloom filter inverts the cost: ONE mergeable aggregate over the
  * train fingerprints builds an m-bit bitset (map-side partial OR
  * merges — the same scale shape as the KMV sketch in
  * [[graft.functions.KmvSketch]]), the bitset ships to every executor
  * as a single broadcast-sized literal, and the probe is a pure
  * scan-local integer expression over the eval side: no join, no
  * shuffle, no second pass over train. False positives are possible
  * (rate ~ (1 - e^(-kn/m))^k), false negatives are not — exactly the
  * guarantee a decontamination gate wants (flag-and-review errs on the
  * safe side).
  *
  * Everything is engine-portable integer arithmetic so the DuckDB
  * oracle replays the bitset semantics exactly: a probe position is
  * set iff SOME train fingerprint hashed to it, which is the same
  * predicate as membership in the distinct train-position SET — the
  * oracle builds that set relationally and left-joins it (q123). The
  * k probe positions come from the md5-derived 60-bit fingerprint via
  * the same affine family as MinHash ([[PortableHash.affineParams]]):
  * `pos_i = ((a_i * (fp mod P) + b_i) mod P) mod m` — one md5 per
  * document, k probes for free, `a*h + b < 2^62` so every term is
  * exact in any int64 engine.
  *
  * Driver-side state is the bitset only: m/8 bytes (m = 2^16 → 8 KB;
  * m = 2^30 at real scale → 128 MB, still one broadcast) — documented
  * like the centroid collects in `Similarity`.
  */
object Bloom {

  private val P = PortableHash.MinhashPrime

  /** An immutable built filter: `bits` has m/64 words, little-endian
    * bit order within each word (bit j of word w = position 64*w + j).
    */
  final case class Filter(bits: Array[Long], m: Int, k: Int) {

    /** JVM-side probe (tests / driver-side spot checks). */
    def contains(fp: Long): Boolean = {
      var i = 0
      while (i < k) {
        val pos = position(fp, i, m)
        if ((bits(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
        i += 1
      }
      true
    }

    /** Number of set bits — load factor diagnostics. */
    def setBits: Long = bits.map(java.lang.Long.bitCount(_).toLong).sum

    /** OR-merge with another filter of identical geometry. */
    def union(other: Filter): Filter = {
      require(other.m == m && other.k == k, "filter geometry mismatch")
      val out = new Array[Long](bits.length)
      var i = 0
      while (i < bits.length) { out(i) = bits(i) | other.bits(i); i += 1 }
      Filter(out, m, k)
    }
  }

  /** The i-th probe position of fingerprint `fp` in an m-bit filter
    * (JVM twin of [[positionCol]]/[[positionSql]]).
    */
  def position(fp: Long, i: Int, m: Int): Int = {
    val (a, b) = PortableHash.affineParams(i)
    ((a * (fp % P) + b) % P % m).toInt
  }

  /** Column computing [[position]] — exact int64 arithmetic. */
  def positionCol(fp: Column, i: Int, m: Int): Column =
    (PortableHash.minhash(fp % lit(P), i) % lit(m.toLong)).cast("int")

  /** DuckDB SQL text computing exactly [[position]]. */
  def positionSql(fpExpr: String, i: Int, m: Int): String =
    s"(${PortableHash.minhashSql(s"($fpExpr) % $P", i)} % $m)"

  /** Mergeable bitset aggregate: each input 60-bit fingerprint sets its
    * k positions; partial buffers OR. NULL fingerprints are ignored.
    */
  class BitsetAgg(m: Int, k: Int)
      extends Aggregator[java.lang.Long, Array[Long], Array[Long]]
      with Serializable {
    require(m > 0 && m % 64 == 0, "m must be a positive multiple of 64")
    require(k >= 1, "k >= 1")

    override def zero: Array[Long] = new Array[Long](m / 64)

    override def reduce(buf: Array[Long], fp: java.lang.Long): Array[Long] = {
      if (fp != null) {
        var i = 0
        while (i < k) {
          val pos = position(fp.longValue(), i, m)
          buf(pos >>> 6) |= 1L << (pos & 63)
          i += 1
        }
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }

    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  /** Column aggregate form of the bitset build — usable inside any
    * groupBy for per-source / per-day partial filters that later
    * [[Filter.union]] up, never re-scanning raw data.
    */
  def bitsetAgg(fp: Column, m: Int, k: Int): Column =
    udaf(new BitsetAgg(m, k)).apply(fp)

  /** Build a filter over a fingerprint column: one aggregate, one
    * bitset row to the driver.
    */
  def build(df: DataFrame, fpCol: Column, m: Int, k: Int): Filter = {
    val row = df.select(bitsetAgg(fpCol, m, k).as("bits")).head()
    val bits =
      if (row.isNullAt(0)) new Array[Long](m / 64) // empty input
      else row.getSeq[Long](0).toArray
    Filter(bits, m, k)
  }

  /** Scan-local membership probe: k codegen'd integer tests against
    * the bitset literal — zero joins, zero shuffles. `element_at` on a
    * literal array embeds ONE reference to the m/64-word bitset in the
    * generated code; plan size is O(k) nodes regardless of m.
    */
  def mightContain(fp: Column, f: Filter): Column =
    probeHits(fp, f) === lit(f.k)

  /** Number of the k probe positions that are set (== k ⇒ might
    * contain; < k ⇒ definitely absent). Exposed so callers can report
    * partial-hit diagnostics and the oracle can hash-check the exact
    * integer, not just the boolean.
    */
  def probeHits(fp: Column, f: Filter): Column = {
    val bitsLit = lit(f.bits)
    (0 until f.k).map { i =>
      val pos = positionCol(fp, i, f.m)
      val word = element_at(bitsLit, shiftright(pos, 6) + lit(1))
      val bit = call_function("shiftright", word, (pos % lit(64)).cast("int"))
        .bitwiseAND(lit(1L))
      bit.cast("int")
    }.reduce(_ + _)
  }
}
