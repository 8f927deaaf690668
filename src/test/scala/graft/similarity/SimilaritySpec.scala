package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // 100 deterministic random vectors + scaled copies of the first 5
  // (same direction -> cosine 1 with the original).
  lazy val vecs: DataFrame = {
    val base = (0 until 100).map { i =>
      val rnd = new scala.util.Random(1000 + i)
      (i.toLong, Array.fill(16)(rnd.nextFloat() - 0.5f))
    }
    val copies = base.take(5).map { case (id, v) =>
      (id + 1000, v.map(_ * 2.0f))
    }
    (base ++ copies).toDF("vec_id", "embedding")
  }

  test("bruteForceTopK ranks the scaled copy first with cosine ~1") {
    val top = Similarity.bruteForceTopK(
      vecs.filter($"vec_id" >= 1000), vecs, "vec_id", "embedding", 3)
      .filter($"rank" === 1).collect()
    assert(top.length === 5)
    top.foreach { r =>
      assert(r.getAs[Long]("n_id") === r.getAs[Long]("q_id") - 1000)
      assert(math.abs(r.getAs[Double]("cosine") - 1.0) < 1e-9)
    }
  }

  test("cosinePairs finds exactly the planted near-identical pairs at 0.99") {
    val pairs = Similarity.cosinePairs(vecs, "vec_id", "embedding", 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === (0 until 5).map(i => (i.toLong, i + 1000L)).toSet)
  }

  test("sign-LSH puts identical-direction vectors in the same bucket") {
    val buckets = Similarity.signLshBuckets(vecs, "vec_id", "embedding")
      .select("vec_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until 5).foreach { i =>
      assert(buckets(i.toLong) === buckets(i + 1000L),
        s"copy of $i hashed to a different bucket")
    }
  }

  test("lshCosinePairs finds every planted pair that brute force finds") {
    val brute = Similarity.cosinePairs(vecs, "vec_id", "embedding", 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshCosinePairs(vecs, "vec_id", "embedding", 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh === brute) // full recall at the near-identical threshold
  }

  test("lshTopK returns the true duplicate and only same-bucket candidates") {
    val res = Similarity.lshTopK(
      vecs.filter($"vec_id" >= 1000), vecs, "vec_id", "embedding", k = 3,
      bits = 8)
    val top1 = res.filter($"rank" === 1).collect()
    assert(top1.length === 5) // every query found at least its duplicate
    top1.foreach { r =>
      assert(r.getAs[Long]("n_id") === r.getAs[Long]("q_id") - 1000)
    }
    // LSH candidate set is a subset of brute-force results by construction:
    // cosine of returned pairs must match brute force exactly
    val brute = Similarity.bruteForceTopK(
      vecs.filter($"vec_id" >= 1000), vecs, "vec_id", "embedding", 100)
      .select($"q_id", $"n_id", $"cosine".as("bcos"))
    val joined = res.join(brute, Seq("q_id", "n_id"))
    assert(joined.filter($"cosine" =!= $"bcos").count() === 0)
  }

  test("IntDotProduct matches the interpreted integer fold") {
    import graft.functions.VectorFunctions
    val rnd = new scala.util.Random(7)
    val rows = (0 until 50).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextInt(255) - 127),
        Array.fill(16)(rnd.nextInt(255) - 127))
    }
    val df = rows.toDF("id", "a", "b")
      .withColumn("dot", VectorFunctions.dotInt($"a", $"b"))
      .collect()
    rows.zip(df.sortBy(_.getAs[Long]("id"))).foreach { case ((_, a, b), r) =>
      val expected = a.zip(b).map { case (x, y) => x.toLong * y }.sum
      assert(r.getAs[Long]("dot") === expected)
    }
  }

  test("quantizedTopK ranks the scaled copy first (direction survives quantization)") {
    val res = Similarity.quantizedTopK(
      vecs.filter($"vec_id" >= 1000), vecs, "vec_id", "embedding", k = 3)
    val top1 = res.filter($"rank" === 1).collect()
    assert(top1.length === 5)
    top1.foreach { r =>
      // a scaled copy has identical direction; symmetric quantization is
      // scale-invariant, so the quantized vectors are IDENTICAL and the
      // quantized cosine is exactly 1
      assert(r.getAs[Long]("n_id") === r.getAs[Long]("q_id") - 1000)
      assert(r.getAs[Double]("qcos") === 1.0)
    }
    // ranking quality: quantized top-3 overlaps exact top-3 heavily
    val brute = Similarity.bruteForceTopK(
      vecs.filter($"vec_id" >= 1000), vecs, "vec_id", "embedding", 3)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val quant = res.select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    assert(quant.intersect(brute).size >= (brute.size * 2) / 3)
  }
}
