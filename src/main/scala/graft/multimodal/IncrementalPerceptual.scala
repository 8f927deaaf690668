package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental ingest for the perceptual IMAGE index — the
  * [[graft.dedup.IncrementalLsh]] contract for [[Perceptual]] dHashes,
  * completing the incremental family for every index the engine keeps
  * (text LSH, semantic, audio, winnowing spans, and now images):
  * decoded-image hashes arrive in batches, only the BATCH is banded,
  * candidates come from new-vs-(stored+new) band collisions, and
  * per-batch pair outputs are exactly-once (the later member's batch
  * emits a pair). Band membership is a per-image quantity, so the
  * union over ANY batching equals the one-shot
  * [[Perceptual.hammingPairs]] run — even in the band-limited regime
  * where `maxHamming` exceeds the pigeonhole guarantee (whether two
  * hashes share a band depends on those two hashes alone). That
  * equivalence is the q151 oracle (q110's SQL verbatim) and the
  * IncrementalPerceptualSpec contract.
  *
  * Index state is one (id, dhash) relation — 16 bytes an image —
  * localCheckpoint-materialized per fold. At 100 TB of media the index
  * is millions of rows where the corpus is petabytes of payload: the
  * decode+dHash scan happens once per image at ingest, never again.
  */
object IncrementalPerceptual {

  /** @param hashes (id: long, dhash: long), materialized */
  final case class PerceptualIndex(hashes: DataFrame, bands: Int,
      hashBits: Int)

  /** Index an initial batch of dHashes; returns the index and the
    * near-pairs within it.
    */
  def build(hashes: DataFrame, maxHamming: Int = 6, bands: Int = 4,
      hashBits: Int = Perceptual.HashBits): (PerceptualIndex, DataFrame) = {
    require(bands > 0 && hashBits % bands == 0, s"bands must divide $hashBits")
    val h = hashes.select(col("id"), col("dhash")).localCheckpoint()
    (PerceptualIndex(h, bands, hashBits),
      HammingOps.verified(
        HammingOps.candidates(h, h, "dhash", bands, hashBits), h, "dhash",
        maxHamming))
  }

  /** Fold one batch in; returns the grown index and the NEW pairs
    * (those with at least one member in the batch).
    */
  def addBatch(idx: PerceptualIndex, hashes: DataFrame,
      maxHamming: Int = 6): (PerceptualIndex, DataFrame) = {
    val newH = hashes.select(col("id"), col("dhash")).localCheckpoint()
    val all = idx.hashes.unionByName(newH).localCheckpoint()
    (idx.copy(hashes = all),
      HammingOps.verified(
        HammingOps.candidates(newH, all, "dhash", idx.bands, idx.hashBits),
        all, "dhash", maxHamming))
  }

  /** Remove images by id (takedowns); already-emitted pairs are the
    * caller's to reconcile, as in [[graft.dedup.IncrementalLsh.delete]].
    */
  def delete(idx: PerceptualIndex, ids: DataFrame,
      idCol: String): PerceptualIndex = {
    val d = ids.select(col(idCol).as("id")).distinct().localCheckpoint()
    idx.copy(hashes =
      idx.hashes.join(d, Seq("id"), "left_anti").localCheckpoint())
  }

  /** Publish the index's hash relation through the catalog (atomic
    * versioned overwrite — the [[graft.dedup.IncrementalLsh.save]]
    * contract; band geometry is caller configuration, not state).
    */
  def save(idx: PerceptualIndex, catalog: graft.catalog.ParquetCatalog,
      name: String, vacuumHistory: Boolean = true): Unit = {
    val t = s"${name}_dhash"
    if (!catalog.exists(t)) catalog.create(t, idx.hashes.schema)
    catalog.overwrite(t, idx.hashes)
    if (vacuumHistory) catalog.vacuum(t)
  }

  /** Rehydrate a [[save]]d index. */
  def load(catalog: graft.catalog.ParquetCatalog, name: String,
      bands: Int = 4, hashBits: Int = Perceptual.HashBits): PerceptualIndex =
    PerceptualIndex(catalog.table(s"${name}_dhash"), bands, hashBits)

  /** Cluster labels over accumulated pairs — [[Perceptual.clusters]]'
    * output shape from incremental state.
    */
  def clusters(idx: PerceptualIndex, pairs: DataFrame): DataFrame =
    HammingOps.clusters(idx.hashes, "dhash", pairs)
}
