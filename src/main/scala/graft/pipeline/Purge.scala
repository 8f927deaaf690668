package graft.pipeline

import graft.catalog.ParquetCatalog
import graft.dedup.IncrementalLsh
import graft.multimodal.{IncrementalAudio, IncrementalPerceptual}
import graft.similarity.IncrementalSemantic
import graft.text.IncrementalWinnow
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unified right-to-be-forgotten sweep across every stored incremental
  * index family (text LSH, semantic embedding, audio fingerprint,
  * winnowing span provenance, perceptual image dHash):
  * ONE call removes an id set from every named index a catalog holds
  * and republishes each relation with its history VACUUMED — after the
  * sweep no current or historical table version retains any purged
  * payload (the per-family `delete`s alone leave the old versions on
  * disk, which is exactly what a takedown must not do).
  *
  * Contract per family (proved by PurgeSpec): post-purge ingest equals
  * rebuilding the index from scratch without the purged documents —
  * index state is per-doc (shingles, bucket rows, member vectors, clip
  * hashes), so removing a doc's rows is indistinguishable from never
  * having indexed it. Already-emitted pairs are history (the LSM
  * contract of the per-family deletes); purging cannot retract past
  * outputs, only stop the ids from matching anything in the future.
  *
  * At 100 TB: each removal is one anti-join per stored relation keyed
  * on the id (the delete set broadcasts); the republish rewrites each
  * relation once — the same cost as the ingest checkpoint the operator
  * families already pay per batch.
  */
object Purge {

  /** Distinct ids actually removed per family (requested ids that were
    * never indexed are no-ops and not counted).
    */
  final case class Report(lshRemoved: Long, semanticRemoved: Long,
      audioRemoved: Long, winnowRemoved: Long = 0L, imageRemoved: Long = 0L)

  /** Remove `ids` from every listed index stored in `catalog` and
    * vacuum each table's version history. Names are the per-family
    * save/load names (`IncrementalLsh.save` etc.).
    */
  def forget(catalog: ParquetCatalog, ids: DataFrame, idCol: String,
      lsh: Seq[String] = Nil, semantic: Seq[String] = Nil,
      audio: Seq[String] = Nil, winnow: Seq[String] = Nil,
      image: Seq[String] = Nil): Report = {
    implicit val s: SparkSession = ids.sparkSession
    val d = ids.select(col(idCol)).distinct().localCheckpoint()
    def nIds(df: DataFrame, key: String): Long =
      df.select(col(key)).distinct().count()
    var (nL, nS, nA, nW, nI) = (0L, 0L, 0L, 0L, 0L)
    // counts run BEFORE each save: the loaded relations read the
    // pre-purge version (still on disk at that point) and the purged
    // relations are localCheckpoint'd, so the save + vacuum that
    // follows invalidates neither
    lsh.foreach { name =>
      val idx = IncrementalLsh.load(catalog, name)
      val next = IncrementalLsh.deleteDocs(idx, d, idCol)
      nL += nIds(idx.shingles, "doc") - nIds(next.shingles, "doc")
      IncrementalLsh.save(next, catalog, name)
    }
    semantic.foreach { name =>
      val idx = IncrementalSemantic.load(catalog, name)
      val next = IncrementalSemantic.delete(idx, d, idCol)
      nS += nIds(idx.members, "id") - nIds(next.members, "id")
      IncrementalSemantic.save(next, catalog, name)
    }
    audio.foreach { name =>
      val idx = IncrementalAudio.load(catalog, name)
      val next = IncrementalAudio.delete(idx, d, idCol)
      nA += nIds(idx.hashes, "id") - nIds(next.hashes, "id")
      IncrementalAudio.save(next, catalog, name)
    }
    winnow.foreach { name =>
      val idx = IncrementalWinnow.load(catalog, name)
      val next = IncrementalWinnow.delete(idx, d, idCol)
      nW += nIds(idx.fps, "id") - nIds(next.fps, "id")
      IncrementalWinnow.save(next, catalog, name)
    }
    image.foreach { name =>
      val idx = IncrementalPerceptual.load(catalog, name)
      val next = IncrementalPerceptual.delete(idx, d, idCol)
      nI += nIds(idx.hashes, "id") - nIds(next.hashes, "id")
      IncrementalPerceptual.save(next, catalog, name)
    }
    Report(nL, nS, nA, nW, nI)
  }
}
