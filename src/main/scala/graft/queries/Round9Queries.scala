package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 queries. Every query replays bit-identically in the DuckDB
  * oracle.
  */
object Round9Queries {

  /** ADC-candidate count for q136's exact re-rank tail. */
  private val PqR = 100

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // IVF-PQ with an exact re-rank tail: the compressed index (q92's
    // exact configuration) picks the 100 strongest ADC candidates per
    // query, then ONLY those rows fetch their original embeddings and
    // are re-scored with the exact double cosine — recall@10 doubles
    // (0.32 -> 0.62 at nProbe=4, saturating the routing ceiling;
    // BASELINE.md round-9 curve) while the float corpus stays cold for
    // all but Q x 100 rows. Exact arithmetic end-to-end, ranks
    // hash-checked.
    "q136_ann_ivfpq_refined" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      graft.similarity.Similarity.ivfPqTopKRefined(
        emb.filter(col("vec_id") < 50), emb, "vec_id", "embedding",
        k = 10, c = Round5Queries.PqC, m = Round5Queries.PqM,
        nProbe = Round5Queries.PqProbe, kCodes = Round5Queries.PqK,
        refineR = PqR)
        .orderBy(col("q_id"), col("rank"))
    }),

    // Cross-corpus PERCEPTUAL contamination (images): q110's corpus
    // split into TRAIN (the originals, rid%4=0) and EVAL (the planted
    // re-encodes, 2x upscales, and phase-shifted near-variants) — the
    // q120/q121 train-vs-eval question asked in dHash space. Banded
    // hamming candidates join ACROSS the corpora only, never within;
    // exact bit_count verify; output (train id, eval id, hamming).
    // One decode pass feeds both sides.
    "q137_perceptual_cross" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      import graft.multimodal.Perceptual
      val hashes = Perceptual.dHashes(Round7Queries.bmpMedia(s, dir))
        .localCheckpoint()
      Perceptual.crossMatches(hashes.filter(col("id") % 4 === 0),
          hashes.filter(col("id") % 4 =!= 0), "id", "dhash",
          maxHamming = 6)
        .orderBy(col("a"), col("b"))
    }),

    // Cross-corpus AUDIO contamination: q129's clip corpus split the
    // same way — TRAIN originals vs EVAL re-encodes/resamples/gain
    // copies; 52-bit spectral fingerprints, cross-only band join,
    // hamming<=3 verify (exhaustive by pigeonhole at 4 bands).
    "q138_audio_cross" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      import graft.multimodal.AudioFp
      val fps = AudioFp.fingerprints(Round8Queries.audioMedia(s, dir))
        .localCheckpoint()
      AudioFp.crossMatches(fps.filter(col("id") % 4 === 0),
          fps.filter(col("id") % 4 =!= 0), "id", "afp")
        .orderBy(col("a"), col("b"))
    }),

    // Right-to-be-forgotten, end to end THROUGH STORAGE: build the LSH
    // index over the initial corpus slice, publish it to a catalog
    // (history deliberately kept), purge an id set with Purge.forget
    // (anti-join + republish + VACUUM — no version retains the purged
    // docs), reload from the purged catalog, and ingest a fresh batch.
    // The emitted pairs must equal a from-scratch build over (initial
    // minus purged) + batch, restricted to batch-touching pairs — the
    // oracle replays exactly that one-shot, proving the purged docs
    // are gone from the STORED index, not merely filtered in memory.
    "q139_purge_forget" -> ((s, dir) => {
      import java.nio.file.Files
      import graft.catalog.ParquetCatalog
      import graft.dedup.IncrementalLsh
      import graft.pipeline.Purge
      val c = PipelineQueries.corpus(s, dir)
      val initial = c.filter(col("doc_id") % 4 =!= 1)
      val batch = c.filter(col("doc_id") % 4 === 1)
      val (idx, _) = IncrementalLsh.build(initial, "doc_id", "text")
      val root = Files.createTempDirectory("graft-q139").toString
      val cat = new ParquetCatalog(s, root)
      IncrementalLsh.save(idx, cat, "lsh", vacuumHistory = false)
      Purge.forget(cat, c.filter(col("doc_id") % 3 === 0)
        .select(col("doc_id")), "doc_id", lsh = Seq("lsh"))
      val (_, pairs) = IncrementalLsh.addBatch(
        IncrementalLsh.load(cat, "lsh"), batch, "doc_id", "text")
      // materialize before deleting the temp catalog the plan reads
      val out = pairs.orderBy(col("a"), col("b")).localCheckpoint()
      Round7bQueries.rmTree(root)
      out
    })
  )

  // ---- oracle SQL ----------------------------------------------------

  private val dotSql = Round5Queries.dotSql

  val oracleSql: Map[String, String] = Map(

    // q92's CTE chain verbatim (training + ADC scoring), then: ADC
    // top-R per query, exact double-cosine re-score of those pairs
    // from the original embeddings, final rank over the exact score.
    "q136_ann_ivfpq_refined" ->
      s"""WITH ${Round5Queries.pqAdcCtesSql},
         |cand_r AS (SELECT q_id, n_id FROM (
         |  SELECT q_id, n_id,
         |    ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY s / sqrt(nq * nc) DESC, n_id ASC) AS rr
         |  FROM adc) t WHERE rr <= $PqR),
         |rs AS (SELECT c.q_id, c.n_id,
         |    ${dotSql("qe.e", "ne.e")}
         |      / sqrt(${dotSql("qe.e", "qe.e")} * ${dotSql("ne.e", "ne.e")})
         |      AS cosine
         |  FROM cand_r c
         |  JOIN emb qe ON qe.vec_id = c.q_id
         |  JOIN emb ne ON ne.vec_id = c.n_id)
         |SELECT q_id, n_id, cosine, rank FROM (
         |  SELECT q_id, n_id, cosine,
         |    ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY cosine DESC, n_id ASC) AS rank
         |  FROM rs) t
         |WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin,

    // q110's generative dHash CTEs verbatim, then the cross-only band
    // join: train side rid%4=0, eval side rid%4<>0 (disjoint by
    // construction), exact hamming verify at the same threshold.
    "q137_perceptual_cross" ->
      s"""WITH ${Round7Queries.imageDhCtesSql},
         |bands AS (
         |  SELECT rid, dhash, bb.band,
         |    (dhash >> (bb.band * 14)) & 16383 AS v
         |  FROM dh, (SELECT unnest(generate_series(0, 3)) AS band) bb)
         |SELECT a, b, hamming FROM (
         |  SELECT DISTINCT x.rid AS a, y.rid AS b,
         |    CAST(bit_count(xor(x.dhash, y.dhash)) AS INT) AS hamming
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.v = y.v
         |   AND x.rid % 4 = 0 AND y.rid % 4 <> 0)
         |WHERE hamming <= 6 ORDER BY a, b""".stripMargin,

    // q129's generative fingerprint CTEs verbatim, then the cross-only
    // band join at 52 bits / 4x13-bit bands / hamming<=3.
    "q138_audio_cross" ->
      s"""WITH ${Round8Queries.audioFpCtesSql},
         |bands AS (
         |  SELECT rid, afp, bb.band, (afp >> (bb.band * 13)) & 8191 AS v
         |  FROM fp, (SELECT unnest(generate_series(0, 3)) AS band) bb)
         |SELECT a, b, hamming FROM (
         |  SELECT DISTINCT x.rid AS a, y.rid AS b,
         |    CAST(bit_count(xor(x.afp, y.afp)) AS INT) AS hamming
         |  FROM bands x JOIN bands y
         |    ON x.band = y.band AND x.v = y.v
         |   AND x.rid % 4 = 0 AND y.rid % 4 <> 0)
         |WHERE hamming <= 3 ORDER BY a, b""".stripMargin,

    // One-shot replay of the post-purge state: near-dup pairs (q20's
    // arithmetic) over (initial minus purged) + batch, restricted to
    // pairs with at least one endpoint in the batch — exactly what the
    // reloaded-then-grown index must emit if and only if the purge
    // removed the docs from storage.
    "q139_purge_forget" ->
      s"""WITH ${PipelineQueries.corpusSql},
         |allowed AS (SELECT doc_id, text FROM corpus
         |  WHERE doc_id % 4 = 1 OR doc_id % 3 <> 0),
         |${PipelineQueries.shinglesSql("allowed")},
         |${PipelineQueries.minhashCtesSql},
         |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         |common AS (
         |  SELECT c.a, c.b, count(*) AS n_common
         |  FROM cand c
         |  JOIN sh x ON x.doc_id = c.a
         |  JOIN sh y ON y.doc_id = c.b AND y.shh = x.shh
         |  GROUP BY c.a, c.b)
         |SELECT cm.a, cm.b,
         |  cm.n_common::DOUBLE / (sa.n_sh + sb.n_sh - cm.n_common) AS jaccard
         |FROM common cm
         |JOIN sizes sa ON sa.doc_id = cm.a
         |JOIN sizes sb ON sb.doc_id = cm.b
         |WHERE cm.n_common::DOUBLE / (sa.n_sh + sb.n_sh - cm.n_common) >= 0.5
         |  AND (cm.a % 4 = 1 OR cm.b % 4 = 1)
         |ORDER BY a, b""".stripMargin
  )
}
