package graft.tools

import graft.dedup.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Adversarial-skew probe for pair→cluster resolution: a planted
  * boilerplate MEGA-CLIQUE (star graph — one template document matched
  * by millions of spokes, far larger than any partition) plus a deep
  * CHAIN (pointer-jumping worst case) through
  * [[Dedup.connectedComponents]] and [[Dedup.survivorsByScore]].
  * Reports wall seconds, rounds-to-convergence, spill bytes, and
  * validates the labels — the "would a boilerplate clique cliff it?"
  * answer on record (round-10 verdict item 8).
  *
  * Usage: `sbt "runMain graft.tools.SkewProbe [spokes] [chainDepth]"`
  * (defaults 2^21 spokes ≈ 2M-edge star, 4096-deep chain).
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val spokes = args.headOption.map(_.toLong).getOrElse(1L << 21)
    val depth = args.lift(1).map(_.toLong).getOrElse(4096L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val spill = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val m = sc.stageInfo.taskMetrics
          spill.addAndGet(m.diskBytesSpilled + m.memoryBytesSpilled)
          ()
        }
      })

    // star: node 0 ~ every spoke (the boilerplate clique as LSH emits
    // it — every copy bucket-matches the representative); chain: a
    // pathological diameter to exercise pointer jumping
    val star = spark.range(1, spokes + 1)
      .select(lit(0L).as("a"), col("id").as("b"))
    val chainBase = 100000000L
    val chain = spark.range(0, depth)
      .select((col("id") + chainBase).as("a"),
        (col("id") + chainBase + 1).as("b"))
    val pairs = star.unionByName(chain).localCheckpoint()

    def timed[A](f: => A): (A, Double, Long) = {
      val s0 = spill.get()
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9, spill.get() - s0)
    }

    var rounds = 0
    val (ccOk, ccSec, ccSpill) = timed {
      val cc = Dedup.connectedComponents(pairs,
        onConverged = r => rounds = r).localCheckpoint()
      val starOk = cc.filter(col("doc_id") <= spokes)
        .filter(col("cluster") =!= 0L).count() == 0
      val chainOk = cc.filter(col("doc_id") >= chainBase)
        .filter(col("cluster") =!= chainBase).count() == 0
      val n = cc.count()
      starOk && chainOk && n == spokes + depth + 2
    }
    require(ccOk, "connectedComponents produced wrong labels under skew")

    // keep-best over the mega-clique: the per-cluster argmax must ride
    // the map-side-combinable aggregation, not a one-task window
    val docs = spark.range(0, spokes + 1)
      .select(col("id").as("doc_id"), (col("id") % 1000L).as("score"))
    val (bestOk, sbSec, sbSpill) = timed {
      val sv = Dedup.survivorsByScore(docs, "doc_id", "score", star)
      val kept = sv.filter(col("kept")).count()
      val winner = sv.filter(col("kept"))
        .orderBy(col("doc_id")).limit(1).collect()(0).getLong(0)
      // expected: one survivor, the max-score min-id member — score is
      // id % 1000, so the best is the smallest id with score 999
      kept == 1L && winner == 999L
    }
    require(bestOk, "survivorsByScore picked the wrong clique survivor")

    println(f"""{"metric":"skew_probe","spokes":$spokes,"chain_depth":$depth,"cc_secs":$ccSec%.2f,"cc_rounds":$rounds,"cc_spill_mb":${ccSpill / 1e6}%.1f,"keepbest_secs":$sbSec%.2f,"keepbest_spill_mb":${sbSpill / 1e6}%.1f}""")
    spark.stop()
  }
}
