package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A materialized MinHash-LSH near-duplicate index: `buckets` holds one
  * (doc, band, bucket) row per band per document, `shingles` the hashed
  * shingle set each Jaccard verification reads. Both are plain
  * DataFrames — persist them as catalog tables to keep the index across
  * sessions (they round-trip losslessly: longs and md5 strings only).
  */
final case class LshIndex(buckets: DataFrame, shingles: DataFrame)

/** Incrementally maintained near-duplicate detection — the ingest path
  * for a GROWING corpus. [[Dedup.minhashNearDuplicates]] answers "which
  * pairs in this corpus are near-dups" in one pass; here the corpus
  * arrives in batches and each batch must be checked against everything
  * already indexed WITHOUT re-hashing the existing documents:
  *
  *   - per batch, only the new documents are shingled, signed, and
  *     banded (cost ∝ batch size);
  *   - candidates come from the new buckets joined against the stored
  *     plus new buckets — new×new and new×old collisions, never
  *     old×old (those were emitted by earlier batches);
  *   - verification reads stored shingles for exactly the collision
  *     partners (one keyed join against the shingle relation; storing
  *     it bucketed on the doc id makes that join shuffle-free on the
  *     index side, the q89 layout story).
  *
  * Batching is exhaustive AND exactly-once: every pair of the full
  * corpus has a unique emitting batch (the later member's), so the
  * union of per-batch outputs equals the one-shot batch run — that
  * equivalence IS the q97 oracle, replayed by the same SQL as q20.
  *
  * Index relations are localCheckpoint-materialized: an index is state,
  * not a recompute recipe — candidate joins must not re-evaluate the
  * whole upstream per action, and lineage must not grow with batches.
  */
object IncrementalLsh {

  /** Index an initial corpus; returns the index and the near-dup pairs
    * within it (a < b, exact Jaccard >= threshold).
    */
  def build(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.5, bands: Int = 6, rowsPerBand: Int = 2,
      n: Int = 3): (LshIndex, DataFrame) = {
    val sh = Dedup.hashedShingles(docs, idCol, textCol, n).localCheckpoint()
    val buckets = Dedup.bucketsFrom(
      Dedup.signaturesFrom(sh, bands * rowsPerBand), bands, rowsPerBand)
      .localCheckpoint()
    (LshIndex(buckets, sh),
      Dedup.verifiedPairs(candidates(buckets, buckets), sh, threshold))
  }

  /** Fold one batch into the index; returns the grown index and the
    * NEW pairs — those with at least one member in the batch. Pairs
    * between two already-indexed documents are never re-emitted.
    */
  def addBatch(idx: LshIndex, docs: DataFrame, idCol: String,
      textCol: String, threshold: Double = 0.5, bands: Int = 6,
      rowsPerBand: Int = 2, n: Int = 3): (LshIndex, DataFrame) = {
    val newSh = Dedup.hashedShingles(docs, idCol, textCol, n)
      .localCheckpoint()
    val newBuckets = Dedup.bucketsFrom(
      Dedup.signaturesFrom(newSh, bands * rowsPerBand), bands, rowsPerBand)
      .localCheckpoint()
    val allBuckets = idx.buckets.unionByName(newBuckets)
    val allSh = idx.shingles.unionByName(newSh)
    // checkpointed: feeds the member semi-join (twice) and the verify —
    // the bucket join must not re-run per consumer
    val cand = candidates(newBuckets, allBuckets).localCheckpoint()
    // Verification touches only collision partners: restrict the stored
    // shingle relation to candidate members before the Jaccard joins so
    // the per-batch SHUFFLE carries members' shingles, not the whole
    // index (the index is still scanned once — the semi join's probe).
    // Sizes are per-doc, so the restriction cannot change any Jaccard.
    val members = cand.select(col("a").as("doc"))
      .unionByName(cand.select(col("b").as("doc"))).distinct()
    val shNeeded = allSh.join(members, Seq("doc"), "left_semi")
    val pairs = Dedup.verifiedPairs(cand, shNeeded, threshold)
    (LshIndex(allBuckets, allSh), pairs)
  }

  /** Remove documents from the index: one anti-join per stored
    * relation, keyed on the doc id (shuffle carries only the delete
    * set against each relation's key partitioning — at scale the
    * delete side broadcasts). Deleting ids that were never indexed is
    * a no-op; pairs already emitted for the deleted docs are history
    * (an index removal does not retract past outputs, same as every
    * LSM-style index).
    */
  def deleteDocs(idx: LshIndex, ids: DataFrame, idCol: String): LshIndex = {
    val d = ids.select(col(idCol).as("doc")).distinct().localCheckpoint()
    LshIndex(
      idx.buckets.join(d, Seq("doc"), "left_anti").localCheckpoint(),
      idx.shingles.join(d, Seq("doc"), "left_anti").localCheckpoint())
  }

  /** Publish the index as catalog tables `<name>_buckets` /
    * `<name>_shingles` (atomic versioned overwrite per relation), then
    * COMPACT the history: older versions are vacuumed so repeated
    * saves keep exactly one on-disk version per relation — the ingest
    * loop can checkpoint after every batch without version directories
    * growing with batch count.
    */
  def save(idx: LshIndex, catalog: graft.catalog.ParquetCatalog,
      name: String, vacuumHistory: Boolean = true): Unit = {
    Seq(s"${name}_buckets" -> idx.buckets,
        s"${name}_shingles" -> idx.shingles).foreach { case (t, df) =>
      if (!catalog.exists(t)) catalog.create(t, df.schema)
      catalog.overwrite(t, df)
      if (vacuumHistory) catalog.vacuum(t)
    }
  }

  /** Rehydrate a [[save]]d index. */
  def load(catalog: graft.catalog.ParquetCatalog, name: String): LshIndex =
    LshIndex(catalog.table(s"${name}_buckets"),
      catalog.table(s"${name}_shingles"))

  /** Band-bucket collisions of `probe` against `all`, normalized to
    * (a < b) and deduped across bands. Probe×probe pairs surface from
    * both orientations, probe×rest from one; `distinct` collapses both
    * cases to a single row.
    */
  private def candidates(probe: DataFrame, all: DataFrame): DataFrame =
    probe.select(col("doc").as("x"), col("band"), col("bucket"))
      .join(all.select(col("doc").as("y"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .filter(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("a"),
        greatest(col("x"), col("y")).as("b"))
      .distinct()
}
