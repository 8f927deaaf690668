package graft.pipeline

import graft.dedup.Dedup
import graft.functions.PortableHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Leakage-safe train/val/test splitting: assignment at near-duplicate
  * CLUSTER granularity, not document granularity. A per-document hash
  * split puts one member of a near-dup pair in train and its twin in
  * test — the classic eval-contamination bug in pretraining pipelines
  * (decontamination q84 guards against a FIXED eval set; this guards
  * the split itself). Here every member of a connected component of
  * the near-dup graph shares the component's min-label cluster id, and
  * the split is a deterministic hash of THAT, so no near-dup pair can
  * ever straddle splits, by construction.
  *
  * Scale shape: connected components are the bucketed pointer-jumping
  * loop ([[Dedup.connectedComponents]]); the join back to the corpus is
  * keyed on the id; the hash split is a scan-side projection. Nothing
  * new shuffles beyond the CC the dedup stage already ran — pipelines
  * that already computed cluster labels can pass them straight in.
  */
object Splits {

  /** Assign each document a split from its near-dup cluster label:
    * `hash(cluster) % 100` under `trainPct` → train, under
    * `trainPct + valPct` → val, else test. Unpaired documents are
    * their own singleton cluster. Output: input columns + `cluster` +
    * `split`. */
  def byCluster(docs: DataFrame, idCol: String, pairs: DataFrame,
      trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"bad split percentages: $trainPct/$valPct")
    val cc = Dedup.connectedComponents(pairs)
      .withColumnRenamed("doc_id", idCol)
    val h = PortableHash.hash60Base(col("cluster").cast("string")) % 100
    docs
      .join(cc, Seq(idCol), "left")
      .withColumn("cluster", coalesce(col("cluster"), col(idCol)))
      .withColumn("split",
        when(h < trainPct, "train")
          .when(h < trainPct + valPct, "val")
          .otherwise("test"))
  }

  /** EXACT stratified split: per source, exactly
    * `floor(n_s * trainPpm / Unit)` rows go to train and the next
    * `floor(n_s * (trainPpm+valPpm)/Unit) - floor(n_s * trainPpm/Unit)`
    * to val — the hash split ([[byCluster]], q115) is proportional only
    * in expectation, which a small high-value source (or a tiny val
    * slice) cannot tolerate. Rows are ranked per source in salted-hash
    * order (deterministic shuffle, independent of the mixture and
    * split gates on the same ids) and the rank is cut at the exact
    * integer boundaries.
    *
    * Scale shape: the per-source rank is [[graft.operators.TwoPhase
    * .prefixSum]] partitioned by source — range partition + slice-sized
    * windows + a broadcast of per-(source, slice) subtotals — never a
    * one-partition-per-source window funnel; the per-source counts are
    * one map-side-combinable aggregate broadcast back (source-count
    * rows). All boundary arithmetic is exact integer (parts per
    * [[Mixture.Unit]]).
    *
    * Output: input columns + `src_rank` (1-based within source) +
    * `split`. Leakage note: assignment is per-document; to also
    * guarantee no near-dup pair straddles splits, collapse to cluster
    * representatives first ([[byCluster]]'s CC) and broadcast the
    * representative's split to members.
    */
  def stratifiedExact(docs: DataFrame, idCol: String, srcCol: String,
      trainPpm: Long = 800000L, valPpm: Long = 100000L): DataFrame = {
    val U = Mixture.Unit
    require(trainPpm > 0 && valPpm >= 0 && trainPpm + valPpm <= U,
      s"bad split ppm: $trainPpm/$valPpm")
    // fail fast: a missing source column would otherwise surface as a
    // confusing partial-resolution error deep inside the prefix sum
    Seq(idCol, srcCol).foreach(c => require(docs.columns.contains(c),
      s"stratifiedExact: input has no column '$c' " +
        s"(columns: ${docs.columns.mkString(", ")})"))
    // exact floor((n * ppm) / U) on longs: subtract the mod, divide —
    // the double division of an exact multiple is exact
    def cut(n: Column, ppm: Long): Column = {
      val prod = n * ppm
      ((prod - pmod(prod, lit(U))) / lit(U)).cast("long")
    }
    val withH = docs.withColumn("__h", PortableHash.hash60Base(
      concat_ws(":", lit("strat"), col(idCol).cast("string"))))
    val ranked = graft.operators.TwoPhase.prefixSum(withH,
      Seq(srcCol), Seq("__h", idCol), lit(1L), "src_rank")
    val counts = docs.groupBy(col(srcCol))
      .agg(count(lit(1)).as("__n"))
    ranked.join(broadcast(counts), Seq(srcCol))
      .withColumn("split",
        when(col("src_rank") <= cut(col("__n"), trainPpm), "train")
          .when(col("src_rank") <= cut(col("__n"), trainPpm + valPpm),
            "val")
          .otherwise("test"))
      .drop("__h", "__n")
  }
}
