package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared machinery of the incremental BANDED-HAMMING indexes
  * ([[IncrementalAudio]] over 52-bit spectral fingerprints,
  * [[IncrementalPerceptual]] over 56-bit image dHashes): disjoint-band
  * keys, new-vs-(stored+new) candidate generation, and the exact
  * `bit_count` verify. Band membership is a per-row quantity — other
  * corpus members cannot change it — so the per-batch pair union over
  * ANY batching equals the one-shot [[Perceptual.hammingPairs]] run;
  * each concrete index owns that contract's oracle.
  */
private[multimodal] object HammingOps {

  /** Explode one (id, hash) relation into its disjoint band keys. */
  def keys(h: DataFrame, hashCol: String, bands: Int,
      hashBits: Int): DataFrame = {
    val bandBits = hashBits / bands
    val bandKeys = (0 until bands).map { bnd =>
      struct(lit(bnd).as("band"),
        shiftright(col(hashCol), bnd * bandBits)
          .bitwiseAND(lit((1L << bandBits) - 1)).as("v"))
    }
    h.select(col("id"), explode(array(bandKeys: _*)).as("bk"))
  }

  /** Candidate ids (a < b, distinct) with at least one member in
    * `newH`: new bands join ALL bands — stored-vs-stored pairs are
    * never regenerated.
    */
  def candidates(newH: DataFrame, allH: DataFrame, hashCol: String,
      bands: Int, hashBits: Int): DataFrame = {
    val l = keys(newH, hashCol, bands, hashBits)
      .select(col("id").as("na"), col("bk").as("kl"))
    val r = keys(allH, hashCol, bands, hashBits)
      .select(col("id").as("nb"), col("bk").as("kr"))
    l.join(r, col("kl") === col("kr") && col("na") =!= col("nb"))
      .select(least(col("na"), col("nb")).as("a"),
        greatest(col("na"), col("nb")).as("b"))
      .distinct()
  }

  /** Exact hamming verify of a candidate relation against the hash
    * store.
    */
  def verified(cand: DataFrame, allH: DataFrame, hashCol: String,
      maxHamming: Int): DataFrame =
    cand
      .join(allH.select(col("id").as("a"), col(hashCol).as("ha")), Seq("a"))
      .join(allH.select(col("id").as("b"), col(hashCol).as("hb")), Seq("b"))
      .filter(bit_count(col("ha").bitwiseXOR(col("hb"))) <= maxHamming)
      .select(col("a"), col("b"))

  /** Cluster labels over accumulated pairs — [[Perceptual.clusters]]'
    * output shape from incremental state.
    */
  def clusters(hashes: DataFrame, hashCol: String,
      pairs: DataFrame): DataFrame = {
    val labels = graft.dedup.Dedup.connectedComponents(pairs)
      .select(col("doc_id").as("__cc_node"), col("cluster").as("__cc_lab"))
    hashes.join(labels, col("id") === col("__cc_node"), "left")
      .select(col("id"), col(hashCol),
        coalesce(col("__cc_lab"), col("id")).as("cluster"),
        (coalesce(col("__cc_lab"), col("id")) =!= col("id")).as("is_dup"))
  }
}
