package graft.similarity

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cluster-balanced diversity selection: per-cluster caps hold, the
  * kept rows are exactly the most central members of each cluster, and
  * the result is layout-independent.
  */
class DiversitySampleSpec extends SparkSpec {

  private def emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    .select(col("vec_id"), col("embedding"))

  private def rows(df: DataFrame): Seq[(Long, Long, Double, Int)] =
    df.select(col("vec_id").cast("long"), col("bucket").cast("long"),
        col("centrality"), col("rank").cast("int"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))

  test("per-cluster cap holds, ranks are dense from 1, every nonempty " +
      "cluster is covered") {
    val out = rows(Similarity.diversitySample(emb, "vec_id", "embedding",
      perCluster = 5, c = 8, iters = 1))
    val byBucket = out.groupBy(_._2)
    assert(byBucket.nonEmpty)
    byBucket.foreach { case (b, members) =>
      assert(members.size <= 5, s"bucket $b over cap")
      assert(members.map(_._4).sorted == (1 to members.size),
        s"bucket $b ranks not dense")
    }
    // the full assignment must not have clusters the sample missed
    val all = rows(Similarity.diversitySample(emb, "vec_id", "embedding",
      perCluster = Int.MaxValue, c = 8, iters = 1))
    assert(all.map(_._2).toSet == byBucket.keySet)
  }

  test("kept rows are exactly the per-cluster centrality top-k") {
    val all = rows(Similarity.diversitySample(emb, "vec_id", "embedding",
      perCluster = Int.MaxValue, c = 8, iters = 1))
    val sampled = rows(Similarity.diversitySample(emb, "vec_id",
      "embedding", perCluster = 3, c = 8, iters = 1))
    val expect = all.groupBy(_._2).flatMap { case (_, ms) =>
      ms.sortBy(m => (-m._3, m._1)).take(3)
    }.map(m => (m._1, m._2)).toSet
    assert(sampled.map(m => (m._1, m._2)).toSet == expect)
  }

  test("result is layout-independent") {
    def run(df: DataFrame) =
      rows(Similarity.diversitySample(df, "vec_id", "embedding",
        perCluster = 4, c = 8, iters = 1)).toSet
    assert(run(emb) == run(emb.repartition(7, col("vec_id"))))
  }
}
