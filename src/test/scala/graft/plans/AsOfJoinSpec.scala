package graft.plans

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("backward as-of picks latest version, inclusive, outer-null on miss") {
    val facts = Seq(
      (1L, 100L, ts("2024-03-15 00:00:00")), // between v1 and v2
      (2L, 100L, ts("2024-06-01 00:00:00")), // exactly v2 start: inclusive
      (3L, 100L, ts("2023-01-01 00:00:00")), // before any version: null
      (4L, 200L, ts("2024-12-01 00:00:00")), // key with one version
      (5L, 300L, ts("2024-12-01 00:00:00"))  // key with no versions: null
    ).toDF("fact_id", "k", "ft")
    val versions = Seq(
      (100L, "v1", ts("2024-01-01 00:00:00")),
      (100L, "v2", ts("2024-06-01 00:00:00")),
      (200L, "w1", ts("2024-01-01 00:00:00"))
    ).toDF("vk", "tag", "vt")
    val out = AsOfJoin.backward(facts, versions,
        Seq(facts("k")), Seq(versions("vk")), facts("ft"), versions("vt"))
      .select("fact_id", "tag").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out === Map(1L -> Some("v1"), 2L -> Some("v2"), 3L -> None,
      4L -> Some("w1"), 5L -> None))
  }

  test("forward as-of picks earliest version at-or-after, outer-null past the end") {
    val facts = Seq(
      (1L, 100L, ts("2024-03-15 00:00:00")), // next is v2
      (2L, 100L, ts("2024-06-01 00:00:00")), // exactly v2 start: inclusive
      (3L, 100L, ts("2024-07-01 00:00:00")), // after last version: null
      (4L, 100L, ts("2023-01-01 00:00:00")), // before v1: takes v1
      (5L, 300L, ts("2024-01-01 00:00:00"))  // key with no versions: null
    ).toDF("fact_id", "k", "ft")
    val versions = Seq(
      (100L, "v1", ts("2024-01-01 00:00:00")),
      (100L, "v2", ts("2024-06-01 00:00:00"))
    ).toDF("vk", "tag", "vt")
    val out = AsOfJoin.forward(facts, versions,
        Seq(facts("k")), Seq(versions("vk")), facts("ft"), versions("vt"))
      .select("fact_id", "tag").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out === Map(1L -> Some("v2"), 2L -> Some("v2"), 3L -> None,
      4L -> Some("v1"), 5L -> None))
  }

  test("matches the composed join+window formulation on random data") {
    val rnd = new scala.util.Random(7)
    val facts = (1 to 400).map { i =>
      (i.toLong, rnd.nextInt(30).toLong, rnd.nextInt(1000).toLong)
    }.toDF("fact_id", "k", "ft")
    // vt unique per key (vid is globally unique) — as-of tie-break on
    // exactly-equal version times is unspecified in both formulations
    val versions = (1 to 120).map { i =>
      (rnd.nextInt(40).toLong, i.toLong, (rnd.nextInt(7) * 131 + i).toLong)
    }.toDF("vk", "vid", "vt")

    val native = AsOfJoin.backward(facts, versions,
        Seq(facts("k")), Seq(versions("vk")), facts("ft"), versions("vt"))
      .select("fact_id", "vid")

    // reference: join-all + keep latest vt<=ft per fact (ties on vt
    // broken by vid desc to mirror "last consumed in sort order")
    val w = Window.partitionBy(col("fact_id"))
      .orderBy(col("vt").desc, col("vid").desc)
    val composed = facts.join(versions,
        facts("k") === versions("vk") && col("vt") <= col("ft"), "left_outer")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("fact_id", "vid")

    val n = native.collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val c = composed.collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(n.size === 400 && c.size === 400)
    assert(n === c)
  }

  test("physical plan: co-partitioned sorts feed the custom exec") {
    val facts = Seq((1L, 1L, 1L)).toDF("fact_id", "k", "ft")
    val versions = Seq((1L, 1L, 1L)).toDF("vk", "vid", "vt")
    val out = AsOfJoin.backward(facts, versions,
      Seq(facts("k")), Seq(versions("vk")), facts("ft"), versions("vt"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(plan.contains("Exchange hashpartitioning"), plan)
    assert(plan.contains("Sort [k"), plan)
  }
}
