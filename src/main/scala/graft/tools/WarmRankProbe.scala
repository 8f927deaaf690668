package graft.tools

import graft.graph.{IncrementalGraph, WebGraph}
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Warm-start PageRank economics probe: the round-12 verdict's
  * "incremental rank maintenance recomputes from scratch" item,
  * measured. Builds the linked-corpus graph, converges cold
  * (exact-integer delta stop), folds an EDGE-LEVEL delta in (1% of
  * pages gain one md5-derived out-link — the incremental-crawl
  * shape), then ranks the grown graph twice: warm-seeded from the
  * previous fixed point vs cold from uniform. Reports rounds +
  * seconds for each and the L1 gap between the two results against
  * the 7·eps contraction bound — warm must be CHEAPER at EQUAL final
  * ranks (within the ball both stops guarantee).
  *
  * Usage: `sbt "runMain graft.tools.WarmRankProbe [sfDir]"`
  */
object WarmRankProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val epsDiv = 100000L
    val maxRounds = 60
    val pages = graft.queries.Round11bQueries.linkedPages(spark, sfDir)
      .localCheckpoint()
    val nodes = Tables(spark, sfDir, "documents")
      .select(col("doc_id").as("node")).localCheckpoint()
    val n = nodes.count()

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val idx = IncrementalGraph.build(pages, "doc_id", "html")
    val (cold, coldSecs) = timed {
      val r = IncrementalGraph.rankConverged(idx, nodes, maxRounds,
        epsDiv)
      r.count(); r
    }
    val coldRounds = cold.select(col("rounds")).head().getInt(0)

    // the fold: 1% of pages gain one extra out-link to a fresh
    // md5-derived target — an edge delta, the node set unchanged
    val delta = pages.filter(col("doc_id") % 100 === 7)
      .select(col("doc_id"), concat(col("html"),
        lit("<a href=\"http://d0.example.com/p/"),
        (graft.functions.PortableHash.hash60(
          col("doc_id").cast("string"), 77) % n).cast("string"),
        lit("\">extra</a>")).as("html"))
    val (idx2, foldSecs) = timed {
      val i = IncrementalGraph.addBatch(idx, delta, "doc_id", "html")
      i.edges.count(); i
    }

    val (warm, warmSecs) = timed {
      val r = IncrementalGraph.rankWarm(idx2, nodes, cold, maxRounds,
        epsDiv)
      r.count(); r
    }
    val warmRounds = warm.select(col("rounds")).head().getInt(0)
    val (cold2, cold2Secs) = timed {
      val r = IncrementalGraph.rankConverged(idx2, nodes, maxRounds,
        epsDiv)
      r.count(); r
    }
    val cold2Rounds = cold2.select(col("rounds")).head().getInt(0)

    val gap = warm.select(col("node"), col("rank").as("wr"))
      .join(cold2.select(col("node"), col("rank").as("cr")), Seq("node"))
      .agg(sum(abs(col("wr") - col("cr")))).head().getLong(0)
    val eps = WebGraph.Scale / epsDiv

    println(
      s"""{"probe":"warm_rank","sf_dir":"$sfDir","n_nodes":$n,""" +
        s""""n_edges":${idx2.edges.count()},"eps":$eps,""" +
        s""""cold_rounds":$coldRounds,"cold_secs":$coldSecs,""" +
        s""""fold_secs":$foldSecs,""" +
        s""""warm_rounds":$warmRounds,"warm_secs":$warmSecs,""" +
        s""""cold2_rounds":$cold2Rounds,"cold2_secs":$cold2Secs,""" +
        s""""l1_gap":$gap,"gap_bound":${7L * eps},""" +
        s""""gap_within_bound":${gap <= 7L * eps}}""")
    spark.stop()
  }
}
