package graft.tools
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfilePipeline {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-22s ${(System.nanoTime()-t0)/1e9}%6.2f s  rows=$n")
    }
    val docs = Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
    val corpus = docs.unionByName(docs.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
    // warm
    corpus.count()
    import graft.text.TextAnalysis
    val stops = Seq("the", "a", "of", "and", "is")
    val gated = corpus.select(col("doc_id"), col("text"),
        TextAnalysis.qualityScore(col("text"), stops).as("quality"),
        TextAnalysis.langId(col("text")).as("lang_pred"))
      .filter(col("quality") >= 0.7 && col("lang_pred").isin("en"))
    t("gates")(gated.count())
    val keep = graft.dedup.Dedup.exactGroups(gated, "doc_id", "text").select(col("keep_id").as("doc_id"))
    t("exactGroups")(keep.count())
    val exact = gated.join(keep, Seq("doc_id"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("persist exact")(exact.count())
    val pairs = graft.dedup.Dedup.minhashNearDuplicates(exact, "doc_id", "text", threshold = 0.5).select(col("a"), col("b"))
    t("minhash pairs")(pairs.count())
    var cc: org.apache.spark.sql.DataFrame = null
    t("connectedComponents"){ cc = graft.dedup.Dedup.connectedComponents(pairs); cc.count() }
    val losers = cc.filter(col("doc_id") =!= col("cluster")).select(col("doc_id"))
    t("anti join final")(exact.join(losers, Seq("doc_id"), "left_anti").count())
    t("full clean replay")(graft.pipeline.CorpusPipeline.clean(corpus, "doc_id", "text").count())
    spark.stop()
  }
}
