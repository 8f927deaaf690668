package graft.tools

import graft.similarity.{IncrementalSemantic, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Recall-drift probe for the STREAMING/INCREMENTAL semantic index
  * (q111/q119): centroids are trained ONCE on the seed corpus and
  * never retrain as the stream grows — q119 proves the pair set is
  * batching-independent, but nothing showed how seed-frozen centroids
  * behave once the corpus has grown far past the training slice. This
  * probe measures it against the one-shot retrained alternative.
  *
  * Construction (the ScaleProbe embedding discipline): replica r of
  * the corpus is the base table under a per-replica ±1 diagonal
  * isometry — within-replica geometry EXACT, cross-replica cosines
  * scrambled to noise, so each replica is genuinely new data with
  * identical planted structure. Every 7th base vector gets a planted
  * NEAR-duplicate partner (one coordinate halved — exact cosine
  * ~0.992..0.999, above the 0.99 threshold but not 1.0, so detection
  * genuinely depends on the pair CO-ASSIGNING to a bucket; exact
  * duplicates would co-assign under arbitrary centroids and measure
  * nothing). The isometry commutes with the plant, so the verified
  * planted-pair count per replica is a replica-invariant computed once
  * at replica 0 with the operator's own double-cosine arithmetic.
  *
  * Per growth factor N, two paths over the SAME N-replica corpus:
  *   - stale: [[IncrementalSemantic.build]] on replica 0 (c=16, the
  *     seed-sized setting), then N-1 sequential [[IncrementalSemantic
  *     .addBatch]] calls — centroids frozen at seed, the q119 shape;
  *   - retrained: one-shot build on the full corpus with c scaled to
  *     the grown size (c = 16·N, the design's c ∝ N scale path).
  *
  * Reported per factor: planted-pair recall of both paths, wall time
  * of both paths, and the stale index's bucket-population skew
  * (max/avg) — the stale path's pair stage joins within seed-sized
  * buckets that now hold N× the population, so its cost curve (not
  * just recall) is part of the retrain decision. Output: one JSON
  * line per factor.
  *
  * Usage: runMain graft.tools.SemanticDriftProbe [sfDir] [factors]
  * (factors comma-separated, default "8,64")
  */
object SemanticDriftProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = args.lift(1).getOrElse("8,64").split(",").map(_.toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val RepOff = 100000000L // replica id offset
    val PartOff = 500000L // planted-partner id offset within a replica
    val threshold = 0.99

    val base = graft.sources.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val dims = base.select(size(col("embedding"))).first().getInt(0)

    // planted near-dup partner: coordinate (vec_id mod dims) halved
    val partnered = base.unionByName(
      base.filter(col("vec_id") % 7 === 0)
        .select((col("vec_id") + PartOff).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            when(i === pmod(col("vec_id"), lit(dims)).cast("int"),
              x * lit(0.5f)).otherwise(x)).as("embedding")))

    // verified planted pairs per replica (replica-invariant under the
    // isometry): exact double cosine of original vs partner >= threshold
    val plantedPerReplica = base.filter(col("vec_id") % 7 === 0)
      .select(col("vec_id"), col("embedding").as("va"))
      .join(partnered.filter(col("vec_id") >= PartOff)
        .select((col("vec_id") - PartOff).as("vec_id"),
          col("embedding").as("vb")), Seq("vec_id"))
      .filter(Similarity.cosine(
        Similarity.asDouble(col("va")), Similarity.asDouble(col("vb")))
        >= threshold)
      .select(col("vec_id")).localCheckpoint()
    val plantedN = plantedPerReplica.count()

    // replica r: ids offset by r*RepOff, ±1 sign pattern keyed on (r, dim)
    def replica(r: Int): DataFrame = partnered
      .select((col("vec_id") + lit(r.toLong * RepOff)).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          x * when(pmod(hash(lit(r) * 64 + i), lit(2)) === 0, 1.0f)
            .otherwise(-1.0f)).as("embedding"))

    // detected planted pairs among a pair relation (a < b holds: the
    // partner id is always the larger one within a replica)
    def plantedHits(pairs: DataFrame): Long = pairs
      .filter(col("b") - col("a") === PartOff)
      .join(plantedPerReplica.select(col("vec_id")),
        pmod(col("a"), lit(RepOff)) === col("vec_id"), "left_semi")
      .count()

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    factors.foreach { n =>
      val full = (0 until n).map(replica).reduce(_ unionByName _)
        .localCheckpoint()
      // stale path: train on replica 0, fold replicas 1..n-1
      val (staleHits, staleSecs) = time {
        var (idx, pairs0) = IncrementalSemantic.build(replica(0),
          "vec_id", "embedding", threshold, c = 16, iters = 2)
        var hits = plantedHits(pairs0.localCheckpoint())
        (1 until n).foreach { r =>
          val (next, pr) = IncrementalSemantic.addBatch(idx, replica(r),
            "vec_id", "embedding", threshold)
          idx = next
          hits += plantedHits(pr.localCheckpoint())
        }
        val pops = idx.members.groupBy(col("bucket")).count()
          .agg(max(col("count")), avg(col("count"))).first()
        (hits, pops.getLong(0), pops.getDouble(1))
      }
      // retrained path: one-shot build on the grown corpus, c ∝ N
      val (retrained, retrainedSecs) = time {
        val (idx, pairs) = IncrementalSemantic.build(full,
          "vec_id", "embedding", threshold, c = 16 * n, iters = 2)
        val hits = plantedHits(pairs.localCheckpoint())
        val pops = idx.members.groupBy(col("bucket")).count()
          .agg(max(col("count")), avg(col("count"))).first()
        (hits, pops.getLong(0), pops.getDouble(1))
      }
      val planted = plantedN * n
      val (sh, smax, savg) = staleHits
      val (rh, rmax, ravg) = retrained
      println(f"""{"factor":$n,"planted":$planted,""" +
        f""""stale_hits":$sh,"stale_recall":${sh.toDouble / planted}%.3f,""" +
        f""""retrained_hits":$rh,"retrained_recall":${rh.toDouble / planted}%.3f,""" +
        f""""stale_secs":$staleSecs%.1f,"retrained_secs":$retrainedSecs%.1f,""" +
        f""""stale_max_bucket":$smax,"stale_avg_bucket":$savg%.0f,""" +
        f""""retrained_max_bucket":$rmax,"retrained_avg_bucket":$ravg%.0f}""")
    }
    spark.stop()
  }
}
