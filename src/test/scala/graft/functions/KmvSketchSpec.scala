package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** KMV distinct-count sketch: buffer algebra properties + end-to-end
  * accuracy through the Spark aggregation path.
  */
class KmvSketchSpec extends SparkSpec {

  import spark.implicits._

  private val k = 16
  private val agg = new KmvSketch(k)

  private def viaReduce(values: Seq[Long]): Array[Long] =
    values.foldLeft(agg.zero)((b, v) => agg.reduce(b, v))

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(80), prop)
    assert(res.passed, res.status.toString)
  }

  private val genHashes: Gen[Seq[Long]] =
    Gen.listOf(Gen.chooseNum(0L, Long.MaxValue))

  test("buffer keeps the k smallest distinct values, sorted") {
    check(Prop.forAll(genHashes) { xs =>
      viaReduce(xs).toSeq == xs.distinct.sorted.take(k)
    })
  }

  test("merge is equivalent to reducing the concatenation (any split)") {
    check(Prop.forAll(genHashes, genHashes) { (xs, ys) =>
      val a = viaReduce(xs)
      val b = viaReduce(ys)
      val merged = agg.merge(a, b)
      merged.toSeq == viaReduce(xs ++ ys).toSeq &&
        agg.merge(b, a).toSeq == merged.toSeq
    })
  }

  test("below k distinct the estimate is exact; above it is within 30% at k=64") {
    // exact regime
    assert(agg.finish(viaReduce(Seq(5L, 9L, 5L, 7L))) == 3.0)
    // estimation regime through the real aggregation path: 20k distinct ids
    val est = spark.range(20000)
      .select(PortableHash.hash60Base(col("id").cast("string")).as("h"))
      .agg(KmvSketch.kmvEstimate(col("h"), 64).as("est"))
      .head().getDouble(0)
    assert(math.abs(est - 20000.0) / 20000.0 < 0.3, s"estimate $est")
  }

  test("estimate is deterministic across partitionings") {
    val df = spark.range(5000)
      .select(PortableHash.hash60Base(col("id").cast("string")).as("h"))
    val e1 = df.repartition(1).agg(KmvSketch.kmvEstimate(col("h"), 64)).head().getDouble(0)
    val e32 = df.repartition(32).agg(KmvSketch.kmvEstimate(col("h"), 64)).head().getDouble(0)
    assert(e1 == e32)
  }

  test("partial-sketch rollup equals the direct estimate (lossless merge)") {
    // 12k ids spread over 10 "days": per-day partial sketches merged
    // upward must give bit-identical estimates to aggregating raw data
    val df = spark.range(12000)
      .select(col("id"), (col("id") % 10).as("day"),
        PortableHash.hash60Base(col("id").cast("string")).as("h"))
    val direct = df.agg(KmvSketch.kmvEstimate(col("h"), 64)).head().getDouble(0)
    val rolled = df.groupBy(col("day"))
      .agg(KmvSketch.kmvBuffer(col("h"), 64).as("sk"))
      .agg(KmvSketch.kmvMergeEstimate(col("sk"), 64))
      .head().getDouble(0)
    assert(rolled == direct)
    // and below-k regime stays exact through the rollup
    val small = spark.range(40)
      .select((col("id") % 4).as("day"),
        PortableHash.hash60Base(col("id").cast("string")).as("h"))
    val smallRolled = small.groupBy(col("day"))
      .agg(KmvSketch.kmvBuffer(col("h"), 64).as("sk"))
      .agg(KmvSketch.kmvMergeEstimate(col("sk"), 64))
      .head().getDouble(0)
    assert(smallRolled == 40.0)
  }
}
