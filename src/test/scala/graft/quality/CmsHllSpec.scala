package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CmsHllSpec extends SparkSpec {
  import spark.implicits._

  private def items(n: Int) =
    (0 until n).map(i => s"item-${i % 97}").toDF("item")

  test("cms merged shards equal a direct build") {
    val all = items(500)
    val direct = CmsSketch.partials(all, "item", 4, 64)
      .orderBy("r", "c").as[(Int, Long, Long)].collect().toSeq
    val merged = CmsSketch.merge(
        CmsSketch.partials(all.limit(200), "item", 4, 64),
        CmsSketch.partials(all.offset(200), "item", 4, 64))
      .orderBy("r", "c").as[(Int, Long, Long)].collect().toSeq
    assert(merged == direct)
  }

  test("cms estimate never undercounts, exact when collision-free") {
    val all = items(500) // 97 distinct, counts 6 or 5
    val sketch = CmsSketch.partials(all, "item", 4, 1024)
    val probes = all.distinct()
    val exact = all.groupBy("item").agg(count(lit(1)).as("n"))
    val got = CmsSketch.estimate(sketch, probes, "item", 4, 1024)
      .join(exact, "item").as[(String, Long, Long)].collect()
    assert(got.nonEmpty && got.forall { case (_, est, n) => est >= n })
    // 97 items in 1024 cells x 4 rows: the min row is collision-free
    assert(got.count { case (_, est, n) => est == n } > 90)
  }

  test("cms estimate is 0 for never-seen items") {
    val sketch = CmsSketch.partials(items(10), "item", 4, 4096)
    val got = CmsSketch.estimate(sketch,
        Seq("unseen-xyz").toDF("item"), "item", 4, 4096)
      .as[(String, Long)].collect().head
    assert(got._2 == 0L) // 10 distinct in 4096 cells: no collision
  }

  test("hll merged shards equal a direct build; complete has 256 rows") {
    val all = (0 until 3000).map(i => s"v$i").toDF("item")
    val direct = HllSketch.registers(all, "item")
      .orderBy("reg").as[(Long, Long)].collect().toSeq
    val merged = HllSketch.merge(
        HllSketch.registers(all.limit(1000), "item"),
        HllSketch.registers(all.offset(1000), "item"))
      .orderBy("reg").as[(Long, Long)].collect().toSeq
    assert(merged == direct)
    val full = HllSketch.complete(HllSketch.registers(all, "item"))
    assert(full.count() == 256)
  }

  test("hll estimate within 10% at 3000 distinct") {
    val all = (0 until 3000).flatMap(i => Seq(s"v$i", s"v$i")).toDF("item")
    val est = HllSketch.complete(HllSketch.registers(all, "item"))
      .select("est").as[Long].head()
    assert(math.abs(est - 3000.0) / 3000.0 < 0.10, s"est=$est")
  }

  test("hll rho saturates at 53 for an all-zero tail") {
    // construct via the same expressions over a crafted hash is not
    // possible from strings; check the register math on the DataFrame
    // path instead: rho is always in [1, 53] for real hashes
    val all = (0 until 2000).map(i => s"w$i").toDF("item")
    val rhos = HllSketch.registers(all, "item")
      .select("max_rho").as[Long].collect()
    assert(rhos.forall(r => r >= 1 && r <= 53))
  }
}
