package graft.similarity

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The IVF argmin must scale in CENTROID COUNT, not just rows: at
  * c ≈ √N (tens of thousands for a 100 TB corpus) a plan with one
  * subtree per centroid cannot even be analyzed. These tests pin the
  * two properties of the [[graft.functions.NearestCentroids]]
  * expression: results identical to an independent argmin, and plan
  * size flat in c.
  */
class PlanSizeSpec extends SparkSpec {

  private def emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")

  private def refNearest(v: Array[Double], cents: Array[Array[Double]],
      nProbe: Int): Seq[Int] = {
    // independent formulation: full sort of (distance, index) pairs
    val scored = cents.zipWithIndex.map { case (cent, i) =>
      val dot = (v, cent).zipped.map(_ * _).foldLeft(0.0)(_ + _)
      val c2 = cent.map(x => x * x).sum
      (-2.0 * dot + c2, i)
    }
    scored.sortBy(identity).take(nProbe).map(_._2).toSeq
  }

  test("nearest_centroids matches an independent argmin, incl. ties") {
    val cents = Similarity.ivfCentroidsPortable(emb, "vec_id", "embedding", 8)
    val got = emb
      .select(col("vec_id"),
        Similarity.nearestCentroids(
          Similarity.asDouble(col("embedding")), cents, 3).as("near"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    val vecs = emb.select(col("vec_id"),
        Similarity.asDouble(col("embedding")).as("e"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    vecs.foreach { case (id, v) =>
      assert(got(id) === refNearest(v, cents, 3), s"vec $id")
    }
    // tie-break: duplicated centroid -> lower index wins
    val dup = Array(cents(0), cents(0), cents(1))
    val tied = emb.limit(5)
      .select(Similarity.nearestCentroids(
        Similarity.asDouble(col("embedding")), dup, 2).as("near"))
      .collect().map(_.getSeq[Int](0).toSeq)
    tied.foreach(s => assert(s.head === 0 || s === Seq(2, 0)))
  }

  test("plan size is flat in centroid count (c=8 vs c=512)") {
    def planLen(c: Int): Int = {
      val cents = Array.tabulate(c)(i =>
        Array.tabulate(64)(j => ((i * 31 + j * 7) % 100).toDouble / 10.0))
      emb.select(Similarity.nearestCentroid(
          Similarity.asDouble(col("embedding")), cents).as("bucket"))
        .queryExecution.optimizedPlan.toString.length
    }
    val small = planLen(8)
    val large = planLen(512)
    assert(large <= small + 64,
      s"plan grew with c: c=8 -> $small chars, c=512 -> $large chars")
  }

  test("hierarchical assignment: flat plan, codegen, agrees on duplicates") {
    val cents = Array.tabulate(1024)(i =>
      Array.tabulate(64)(j => math.sin(i * 64 + j) * 10))
    def planLen(cs: Array[Array[Double]]): Int =
      emb.select(Similarity.hierarchicalAssign(
          Similarity.asDouble(col("embedding")), cs).as("bucket"))
        .queryExecution.optimizedPlan.toString.length
    assert(planLen(cents) <= planLen(cents.take(16)) + 64,
      "two-level plan must not grow with c")
    val df = emb.select(col("vec_id"),
      Similarity.hierarchicalAssign(
        Similarity.asDouble(col("embedding")), cents).as("bucket"))
    assert(df.queryExecution.executedPlan.toString.contains("*(1) Project"))
    // identical vectors co-assign under the approximate rule too — the
    // property semantic dedup rests on
    val dup = emb.select(col("vec_id"), col("embedding"))
      .unionByName(emb.select((col("vec_id") + 10000L).as("vec_id"),
        col("embedding")))
    val out = dup.select(col("vec_id"),
        Similarity.hierarchicalAssign(
          Similarity.asDouble(col("embedding")), cents).as("bucket"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    out.keys.filter(_ < 10000L).foreach { id =>
      assert(out(id) == out(id + 10000L), s"copy of $id moved bucket")
    }
  }

  test("c=1024 assignment executes through whole-stage codegen") {
    val cents = Array.tabulate(1024)(i =>
      Array.tabulate(64)(j => math.sin(i * 64 + j) * 10))
    val df = emb.select(col("vec_id"),
      Similarity.nearestCentroid(
        Similarity.asDouble(col("embedding")), cents).as("bucket"))
    assert(df.count() === 500)
    val buckets = df.select(countDistinct(col("bucket"))).head.getLong(0)
    assert(buckets > 1) // the argmin actually discriminates
    // and the executed plan stayed one projection inside codegen (the
    // "*(n)" prefix marks a WholeStageCodegen stage)
    assert(df.queryExecution.executedPlan.toString.contains("*(1) Project"))
  }
}
