package graft.tools

import java.nio.file.Files

import graft.catalog.ParquetCatalog
import graft.scd.DmlSql
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Point-DELETE write-amplification probe: copy-on-write (q176's path)
  * rewrites the whole table version for a one-row DELETE; merge-on-read
  * (q197's path) writes a deletion-vector sidecar sized by the delete.
  * This probe publishes the same table through both paths, runs the
  * same one-row DELETE, and reports seconds + bytes written per path,
  * plus the scan cost of an 8-delta chain before and after compaction.
  *
  * Usage: `sbt "runMain graft.tools.MorProbe [sfDir] [replicas]"` —
  * documents replicated `replicas`× with disjoint ids to make the
  * table big enough that the rewrite cost is unmistakable.
  */
object MorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).map(_.toInt).getOrElse(16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("source"))
    val big = (0 until mult).map { i =>
      base.select((col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
        col("text"), col("source"))
    }.reduce(_ unionByName _).localCheckpoint()
    val nRows = big.count()

    val root = Files.createTempDirectory("graft-morprobe").toString
    val cat = new ParquetCatalog(spark, root)
    def seed(name: String): Unit = {
      cat.create(name, big.schema); cat.overwrite(name, big)
    }
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    seed("t_cow"); seed("t_mor")
    val baseBytes = cat.stats("t_cow").bytes

    val (_, cowSec) = timed {
      DmlSql.execute(spark, cat, "DELETE FROM t_cow WHERE doc_id = 7")
    }
    val cowBytes = cat.stats("t_cow").bytes

    val (_, morSec) = timed {
      DmlSql.executeMor(spark, cat,
        "DELETE FROM t_mor WHERE doc_id = 7", "doc_id")
    }
    val morBytes = cat.stats("t_mor").bytes // delta version only: dv sidecar

    // chain cost: 7 more point deletes -> 8-delta chain, scan it,
    // compact, scan again
    (1 to 7).foreach { k =>
      DmlSql.executeMor(spark, cat,
        s"DELETE FROM t_mor WHERE doc_id = ${7 + k}", "doc_id")
    }
    val chain = cat.deltaChainLength("t_mor")
    val (n1, chainScanSec) = timed(cat.table("t_mor").count())
    val (_, compactSec) = timed(cat.compact("t_mor"))
    val (n2, fullScanSec) = timed(cat.table("t_mor").count())
    require(n1 == n2 && n1 == nRows - 8, s"content drift: $n1 vs $n2")

    println(f"""{"metric":"mor_probe","rows":$nRows,"base_bytes":$baseBytes,"cow_delete_secs":$cowSec%.3f,"cow_bytes_written":$cowBytes,"mor_delete_secs":$morSec%.3f,"mor_bytes_written":$morBytes,"write_amplification_ratio":${cowBytes.toDouble / math.max(morBytes, 1)}%.1f,"chain_len":$chain,"chain_scan_secs":$chainScanSec%.3f,"compact_secs":$compactSec%.3f,"compacted_scan_secs":$fullScanSec%.3f}""")
    graft.queries.Round7bQueries.rmTree(root)
    spark.stop()
  }
}
