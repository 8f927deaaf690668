package graft.scd

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  test("diff classifies inserts, deletes, null-safe updates; drops unchanged") {
    val prev = Seq(
      (1L, Some(10.0), "a"),
      (2L, None, "b"),
      (3L, Some(30.0), "c"),
      (4L, Some(40.0), "d")
    ).toDF("k", "x", "s")
    val next = Seq(
      (1L, Some(10.0), "a"),  // unchanged -> absent from feed
      (2L, Some(20.0), "b"),  // NULL -> value: update (null-safe)
      (3L, None, "c"),        // value -> NULL: update
      (5L, Some(50.0), "e")   // new key: insert; key 4 deleted
    ).toDF("k", "x", "s")
    val got = SnapshotDiff.diff(prev, next, Seq("k")).collect()
      .map(r => r.getLong(1) -> (r.getString(0),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got === Map(
      2L -> ("update", Some(20.0)),
      3L -> ("update", None),
      4L -> ("delete", Some(40.0)),
      5L -> ("insert", Some(50.0))))
  }

  test("the diff's surviving rows reconstruct the next snapshot over prev") {
    // CDC loop closure: prev + (inserts ∪ updates) - deletes == next
    val prev = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val next = Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("k", "v")
    val feed = SnapshotDiff.diff(prev, next, Seq("k")).cache()
    val upserts = feed.filter(col("op") =!= "delete").select("k", "v")
    val deletes = feed.filter(col("op") === "delete").select("k")
    val rebuilt = prev
      .join(feed.select("k"), Seq("k"), "left_anti") // untouched rows
      .unionByName(upserts)
      .join(deletes, Seq("k"), "left_anti")
    assert(rebuilt.as[(Long, String)].collect().toSet ===
      next.as[(Long, String)].collect().toSet)
  }
}
