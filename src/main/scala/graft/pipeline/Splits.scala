package graft.pipeline

import graft.dedup.Dedup
import graft.functions.PortableHash
import org.apache.spark.sql.DataFrame
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
}
