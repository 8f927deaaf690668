package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental ingest for the perceptual AUDIO index — the
  * [[graft.dedup.IncrementalLsh]] contract for [[AudioFp]] fingerprints:
  * clips arrive in batches, only the BATCH is fingerprint-banded,
  * candidates come from new-vs-(stored+new) band collisions, and
  * per-batch pair outputs are exactly-once (the later member's batch
  * emits a pair), so the union over any batching equals the one-shot
  * [[Perceptual.hammingPairs]] run — band membership, like a MinHash
  * bucket, is a per-clip quantity that other corpus members cannot
  * change. That equivalence is the q131 oracle (q129's SQL verbatim)
  * and the IncrementalAudioSpec contract.
  *
  * Index state is one (id, afp) relation — 16 bytes a clip —
  * localCheckpoint-materialized per fold (an index is state, not a
  * plan). At 100 TB of audio the index is millions of rows where the
  * corpus is petabytes of payload: the decode+fingerprint scan happens
  * once per clip at ingest, never again.
  */
object IncrementalAudio {

  /** @param hashes (id: long, afp: long), materialized */
  final case class AudioIndex(hashes: DataFrame, bands: Int, hashBits: Int)

  private def candidates(newH: DataFrame, allH: DataFrame, bands: Int,
      hashBits: Int): DataFrame =
    HammingOps.candidates(newH, allH, "afp", bands, hashBits)

  private def verified(cand: DataFrame, allH: DataFrame,
      maxHamming: Int): DataFrame =
    HammingOps.verified(cand, allH, "afp", maxHamming)

  /** Index an initial batch of fingerprints; returns the index and the
    * near-pairs within it.
    */
  def build(hashes: DataFrame, maxHamming: Int = 3, bands: Int = 4,
      hashBits: Int = AudioFp.HashBits): (AudioIndex, DataFrame) = {
    require(bands > 0 && hashBits % bands == 0, s"bands must divide $hashBits")
    val h = hashes.select(col("id"), col("afp")).localCheckpoint()
    (AudioIndex(h, bands, hashBits),
      verified(candidates(h, h, bands, hashBits), h, maxHamming))
  }

  /** Fold one batch in; returns the grown index and the NEW pairs
    * (those with at least one member in the batch).
    */
  def addBatch(idx: AudioIndex, hashes: DataFrame,
      maxHamming: Int = 3): (AudioIndex, DataFrame) = {
    val newH = hashes.select(col("id"), col("afp")).localCheckpoint()
    val all = idx.hashes.unionByName(newH).localCheckpoint()
    (idx.copy(hashes = all),
      verified(candidates(newH, all, idx.bands, idx.hashBits), all,
        maxHamming))
  }

  /** Remove clips by id (e.g. takedowns); already-emitted pairs are the
    * caller's to reconcile, as in [[graft.dedup.IncrementalLsh.delete]].
    */
  def delete(idx: AudioIndex, ids: DataFrame, idCol: String): AudioIndex = {
    val d = ids.select(col(idCol).as("id")).distinct().localCheckpoint()
    idx.copy(hashes =
      idx.hashes.join(d, Seq("id"), "left_anti").localCheckpoint())
  }

  /** Publish the index's hash relation through the catalog (atomic
    * versioned overwrite — the [[graft.dedup.IncrementalLsh.save]]
    * contract; band geometry is caller configuration, not state).
    */
  def save(idx: AudioIndex, catalog: graft.catalog.ParquetCatalog,
      name: String, vacuumHistory: Boolean = true): Unit = {
    val t = s"${name}_afp"
    if (!catalog.exists(t)) catalog.create(t, idx.hashes.schema)
    catalog.overwrite(t, idx.hashes)
    if (vacuumHistory) catalog.vacuum(t)
  }

  /** Rehydrate a [[save]]d index. */
  def load(catalog: graft.catalog.ParquetCatalog, name: String,
      bands: Int = 4, hashBits: Int = AudioFp.HashBits): AudioIndex =
    AudioIndex(catalog.table(s"${name}_afp"), bands, hashBits)

  /** Cluster labels over accumulated pairs — [[Perceptual.clusters]]'
    * output shape from incremental state.
    */
  def clusters(idx: AudioIndex, pairs: DataFrame): DataFrame =
    HammingOps.clusters(idx.hashes, "afp", pairs)
}
