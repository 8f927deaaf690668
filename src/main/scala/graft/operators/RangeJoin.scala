package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join WITHOUT an equi key, bucketized.
  *
  * The naive plan for `points JOIN intervals ON p BETWEEN s AND e` is a
  * broadcast-nested-loop (fine only while one side broadcasts) or a
  * cartesian product (never fine). The scale shape: quantize time into
  * fixed buckets, explode each interval into the buckets it covers, and
  * equi-join points to interval-buckets on the bucket id — the shuffle
  * keys on the bucket, both sides stream, and AQE skew-splits hot
  * buckets. Each (point, interval) match is produced EXACTLY once (a
  * point lives in one bucket; an interval covers that bucket once), so
  * no dedupe pass is needed.
  *
  * Bucket width tunes the candidate ratio: width ≈ the median interval
  * length keeps the explode factor ~2 while leaving each bucket's
  * candidate set tight. (Same bucketize-then-verify pattern as the LSH
  * candidates in `graft.dedup` — candidates from an equality join, exact
  * predicate as the verify.)
  */
object RangeJoin {

  /** Inner-join `points` to every interval containing them:
    * `start <= point < end` (end exclusive), all three columns in the
    * same numeric domain (e.g. epoch micros). Output: all point columns
    * + all interval columns.
    *
    * @param bucketWidth bucket size in the shared domain's units
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0)
    val pb = points.withColumn("__bucket",
      floor(col(pointCol) / bucketWidth).cast("long"))
    // end is exclusive: an interval ending exactly on a bucket edge does
    // not reach into that bucket. The stop is clamped to >= start so a
    // malformed interval (end <= start) explodes into one bucket and dies
    // on the exact predicate, instead of sequence() stepping -1 (spurious
    // candidates) or generating a huge descending list.
    val startBucket = floor(col(startCol) / bucketWidth).cast("long")
    val endBucket = floor((col(endCol) - 1) / bucketWidth).cast("long")
    val ib = intervals.withColumn("__bucket",
      explode(sequence(startBucket, greatest(startBucket, endBucket))))
    pb.join(ib, Seq("__bucket"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bucket")
  }
}
