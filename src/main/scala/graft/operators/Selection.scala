package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact order statistics without a global sort: iterative histogram
  * refinement (the classic distributed selection algorithm — e.g.
  * Blum-style median-of-range narrowing adapted to aggregates).
  *
  * `percentile`/ORDER BY give exact answers by sorting — a corpus-wide
  * shuffle whose single-key reduce is the same scale killer as the
  * reference's global ROW_NUMBER (SURVEY §4.3). [[HistSketch]]-style
  * sketches avoid the sort but answer only to bin precision. This
  * operator is the third point of the triangle: EXACT, and each round
  * is one map-side-combinable `buckets`-cell histogram over the
  * current candidate range — no shuffle wider than `buckets` rows, no
  * row ever leaves its executor. The candidate range shrinks ~buckets×
  * per round, so rounds = ceil(log_buckets(valueRange)): 3 passes for
  * a 32-bit range at the default 256 buckets, with each pass's range
  * filter pushed down to the parquet scan.
  *
  * All arithmetic is int64-exact (bucket width computed in BigInt on
  * the driver, truncating div on nonnegative offsets in the plan), so
  * the selected value is deterministic under any partitioning.
  */
object Selection {

  /** The k-th smallest (1-based, duplicates counted — the value at
    * `ORDER BY c LIMIT 1 OFFSET k-1`) of a long-typed column.
    * NULLs are ignored (not counted by k), matching SQL ordering
    * semantics with NULLS LAST.
    */
  def kthSmallest(df: DataFrame, c: Column, k: Long,
      buckets: Int = 256): Long = {
    require(buckets >= 2, "buckets >= 2")
    val bounds = df.agg(min(c), max(c), count(c)).head()
    require(!bounds.isNullAt(0), "kthSmallest over empty/all-NULL input")
    var lo = bounds.getLong(0)
    var hi = bounds.getLong(1)
    val n = bounds.getLong(2)
    require(k >= 1 && k <= n, s"rank $k out of 1..$n")
    // `c - lo` must stay in int64 inside the plan (ANSI would throw)
    require(BigInt(hi) - BigInt(lo) < (BigInt(1) << 62),
      "value range too wide for exact int64 selection")
    var kRem = k
    while (lo < hi) {
      val width =
        ((BigInt(hi) - BigInt(lo) + buckets) / buckets).toLong.max(1L)
      // truncating div == floor div: the offset is nonnegative
      val hist = df
        .filter(c >= lit(lo) && c <= lit(hi))
        .groupBy(call_function("div", c - lit(lo), lit(width)).as("b"))
        .agg(count(lit(1)).as("cnt"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .sortBy(_._1)
      var cum = 0L
      var idx = 0
      while (cum + hist(idx)._2 < kRem) { cum += hist(idx)._2; idx += 1 }
      val b = hist(idx)._1
      kRem -= cum
      // BigInt: lo + b*width is always <= hi (bucket b is occupied), but
      // the tentative upper bound lo + width - 1 can exceed Long.MaxValue
      // when hi sits within one bucket width of it — min in BigInt first
      val newLo = BigInt(lo) + BigInt(b) * width
      hi = (newLo + (width - 1)).min(BigInt(hi)).toLong
      lo = newLo.toLong
    }
    lo
  }
}
