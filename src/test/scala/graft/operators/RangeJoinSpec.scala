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
      (5L, 7L, 8L),     // width 1
      (6L, 30L, 30L)    // zero-length ON a bucket boundary: the bucket
                        // stop clamps to the start bucket and the exact
                        // predicate drops its rows — empty intervals
                        // match nothing, never error
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

  test("badly inverted interval (end far below start) matches nothing cheaply") {
    // without the clamp, sequence() would emit a ~1e6-element descending
    // bucket list for this row; with it, one bucket, zero matches
    val intervals = Seq((1L, 10000000L, 3L)).toDF("iv_id", "s", "e")
    val points = (0L until 50L).map(p => (p, p)).toDF("p_id", "p")
    val got = RangeJoin.pointInInterval(points, intervals, "p", "s", "e",
      bucketWidth = 10L)
    assert(got.count() === 0L)
  }

  test("fuzz: random intervals/points/widths agree with the naive join") {
    val rnd = new scala.util.Random(42)
    val intervals = (1L to 150L).map { i =>
      val s = rnd.nextInt(1000).toLong
      (i, s, s + rnd.nextInt(120)) // includes zero-length (empty) spans
    }.toDF("iv_id", "s", "e")
    val points = (1L to 300L).map(p => (p, rnd.nextInt(1100).toLong - 50))
      .toDF("p_id", "p")
    val naive = points.join(intervals, $"p" >= $"s" && $"p" < $"e")
      .select($"p_id", $"iv_id").as[(Long, Long)].collect().sorted.toSeq
    Seq(1L, 3L, 7L, 10L, 64L, 1000L).foreach { w =>
      val got = RangeJoin.pointInInterval(points, intervals, "p", "s", "e", w)
        .select($"p_id", $"iv_id").as[(Long, Long)].collect()
      assert(got.length === got.toSet.size, s"width $w emitted duplicates")
      assert(got.sorted.toSeq === naive, s"width $w diverged")
    }
  }
}
