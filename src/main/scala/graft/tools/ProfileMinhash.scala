package graft.tools

import graft.dedup.Dedup
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the MinHash-LSH pipeline at a given SF:
  * `sbt "runMain graft.tools.ProfileMinhash [sfDir]"`.
  */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("profile-minhash")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val d = Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
    val corpus = d
      .unionByName(d.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
      .unionByName(d.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 2000000).as("doc_id"),
          concat(col("text"), lit(" zz tail marker")).as("text")))

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    // warmup
    corpus.count()
    time("corpus count")(corpus.count())
    time("shingles")(Dedup.shingles(corpus, "doc_id", "text").count())
    time("hashedShingles")(Dedup.hashedShingles(corpus, "doc_id", "text").count())
    time("signatures (12 mins)")(
      Dedup.minhashSignatures(corpus, "doc_id", "text", 12).count())
    time("candidates")(Dedup.minhashCandidates(corpus, "doc_id", "text").count())
    time("full nearDuplicates")(
      Dedup.minhashNearDuplicates(corpus, "doc_id", "text").count())
    time("full again (cached?)")(
      Dedup.minhashNearDuplicates(corpus, "doc_id", "text").count())
    spark.stop()
  }
}
