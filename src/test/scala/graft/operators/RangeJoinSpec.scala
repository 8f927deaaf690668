package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketized point-in-interval equals the naive between join, once per match") {
    // intervals deliberately hit the edge cases: within one bucket,
    // spanning many, end exactly on a bucket boundary, zero-ish length
    val intervals = Seq(
      (1L, 5L, 8L),     // inside one bucket
      (2L, 5L, 35L),    // spans 4 buckets
      (3L, 10L, 20L),   // end exactly on a bucket edge (exclusive)
      (4L, 19L, 21L),   // straddles an edge
      (5L, 7L, 8L)      // width 1
    ).toDF("iv_id", "s", "e")
    val points = (0L until 40L).map(p => (p, p)).toDF("p_id", "p")
    val got = RangeJoin.pointInInterval(points, intervals, "p", "s", "e",
        bucketWidth = 10L)
      .select($"p_id", $"iv_id").as[(Long, Long)].collect()
    val expected = points.join(intervals, $"p" >= $"s" && $"p" < $"e")
      .select($"p_id", $"iv_id").as[(Long, Long)].collect()
    // exact multiset equality: every match exactly once, none invented
    assert(got.sorted.toSeq === expected.sorted.toSeq)
    assert(got.length === got.toSet.size) // no duplicate emissions
    // spot-check semantics: start inclusive, end exclusive
    val asSet = got.toSet
    assert(asSet.contains((10L, 3L)) && !asSet.contains((20L, 3L)))
    assert(asSet.contains((7L, 5L)) && !asSet.contains((8L, 5L)))
  }
}
