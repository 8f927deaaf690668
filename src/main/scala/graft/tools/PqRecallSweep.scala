package graft.tools

import graft.similarity.Similarity
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** kCodes recall/cost curve for IVF-PQ (round-7 verdict item 7):
  * sweep the per-subspace codebook size at sf0.1 against the
  * brute-force cosine oracle, at the q92 configuration (c=16, m=8,
  * nProbe=4, k=10) and at full probe (nProbe=c) which isolates PQ
  * reconstruction quality from coarse-routing loss. One JSON line per
  * kCodes value; paste into BASELINE.md.
  */
object PqRecallSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables(spark, dir, "embeddings").localCheckpoint()
    val n = emb.count()
    val q = emb.filter(col("vec_id") < 50).localCheckpoint()
    val brute = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val (c, m, nProbe) = (16, 8, 4)
    Seq(16, 64, 256).foreach { kCodes =>
      val t0 = System.nanoTime()
      val idx = Similarity.IvfPqIndex.build(
        emb, "vec_id", "embedding", c = c, m = m, kCodes = kCodes)
      val enc = idx.encode(emb, "vec_id", "embedding").localCheckpoint()
      val build = (System.nanoTime() - t0) / 1e9
      def recall(np: Int): Double = {
        val pq = idx.topK(q, enc, "vec_id", "embedding", 10, np)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        (brute intersect pq).size.toDouble / brute.size
      }
      val t1 = System.nanoTime()
      val rProbe = recall(nProbe)
      val query = (System.nanoTime() - t1) / 1e9
      val rFull = recall(c)
      // exact re-rank tail (round-8 verdict item 1): ADC top-R then
      // exact double-cosine re-score of only those candidates
      def recallRefined(np: Int, r: Int): (Double, Double) = {
        val t = System.nanoTime()
        val pq = idx.topKRefined(q, enc, emb, "vec_id", "embedding",
            10, np, r)
          .collect().map(row => (row.getLong(0), row.getLong(1))).toSet
        ((brute intersect pq).size.toDouble / brute.size,
          (System.nanoTime() - t) / 1e9)
      }
      val (rRef100, tRef100) = recallRefined(nProbe, 100)
      val (rRef1000, _) = recallRefined(nProbe, 1000)
      // routing ceiling: refine EVERYTHING in the probed buckets
      val (rCeil, _) = recallRefined(nProbe, Int.MaxValue)
      val (rRef8, tRef8) = recallRefined(8, 100)
      val (rRefFull, _) = recallRefined(c, 1000)
      println(s"""{"kCodes":$kCodes,"n":$n,"build_s":$build,""" +
        s""""recall_probe$nProbe":$rProbe,"recall_full":$rFull,""" +
        s""""refine100_probe$nProbe":$rRef100,""" +
        s""""refine1000_probe$nProbe":$rRef1000,""" +
        s""""routing_ceiling_probe$nProbe":$rCeil,""" +
        s""""refine100_probe8":$rRef8,""" +
        s""""refine1000_full":$rRefFull,""" +
        s""""query_s":$query,"refine100_s":$tRef100,""" +
        s""""refine100_probe8_s":$tRef8}""")
    }
    spark.stop()
  }
}
