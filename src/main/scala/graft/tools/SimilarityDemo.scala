package graft.tools

import graft.similarity.Similarity
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Runnable example: embedding near-dup detection on the real embeddings
  * table (with planted scaled copies), brute force vs the LSH-bucketed
  * scale path. `sbt "runMain graft.tools.SimilarityDemo [sfDir]"`.
  */
object SimilarityDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("similarity-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val planted = emb.filter(col("vec_id") % 10 === 0).select(
      (col("vec_id") + 100000).as("vec_id"),
      transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
    val corpus = emb.unionByName(planted)

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val brute = timed("brute-force pairs") {
      Similarity.cosinePairs(corpus, "vec_id", "embedding", 0.99)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val lsh = timed("LSH-bucketed pairs") {
      Similarity.lshCosinePairs(corpus, "vec_id", "embedding", 0.99)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    println(s"corpus=${corpus.count()}  brute pairs=${brute.size}  " +
      s"lsh pairs=${lsh.size}  recall=${
        if (brute.isEmpty) 1.0 else lsh.intersect(brute).size.toDouble / brute.size}")
    spark.stop()
  }
}
