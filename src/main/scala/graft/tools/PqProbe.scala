package graft.tools
import graft.similarity.Similarity
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PqProbe {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb1 = Tables(spark, "/root/testdata/sf0.1", "embeddings")
    val reps = spark.range(factor).withColumnRenamed("id", "__rep")
    val embN = emb1.crossJoin(reps)
      .withColumn("vec_id", col("vec_id") + col("__rep") * 100000000L)
      .drop("__rep")
      .localCheckpoint()
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag%-12s ${(System.nanoTime()-t0)/1e9}%6.2f s"); r
    }
    t("count")(embN.count())
    // quantize alone: the withQuantizedDouble transforms via the public door
    val qz = embN.select(col("vec_id"), col("embedding"))
      .withColumn("__e", col("embedding").cast("array<double>"))
      .withColumn("__mab", array_max(transform(col("__e"), x => abs(x))))
      .filter(col("__mab") > 0)
      .withColumn("qi", transform(col("__e"),
        x => round(x * lit(127.0) / col("__mab")).cast("int")))
    t("quantize")(qz.select(sum(element_at(col("qi"), 1))).collect())
    t("quantize2")(qz.select(sum(element_at(col("qi"), 1))).collect())
    val q = embN.filter(col("vec_id") < 50).localCheckpoint()
    val idx = t("build")(Similarity.IvfPqIndex.build(embN, "vec_id", "embedding", c=16, m=8, kCodes=64))
    val enc0 = idx.encode(embN, "vec_id", "embedding")
    val enc = t("encode")(enc0.localCheckpoint())
    t("topk")(idx.topK(q, enc, "vec_id", "embedding", 10, 4).count())
    t("full")(Similarity.ivfPqTopK(q, embN, "vec_id", "embedding", 10, 16, 8, 4, 64).count())
    spark.stop()
  }
}
