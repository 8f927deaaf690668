package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 queries, second batch: the perceptual image index joins the
  * incremental + streaming families (q151/q152), the unified purge
  * sweep covers the winnowing and image families end to end through
  * storage (q153), and DSIR-style importance resampling joins the
  * mixture toolbox (q154). Every query replays bit-identically in the
  * DuckDB oracle.
  */
object Round9bQueries {

  /** q154 feature-space size (hashed unigram+bigram buckets). */
  private val DsirDim = 256

  /** q154 target keep rate, parts per million. */
  private val DsirKeepPpm = 500000L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Incremental ingest for the perceptual IMAGE index — the
    // incremental family's fifth and last member (text LSH q97,
    // semantic q111, audio q131, winnow q149): q110's planted image
    // corpus arrives in 3 batches (%3), only the batch is banded per
    // fold, candidates from new-vs-(stored+new) band collisions,
    // pairs exactly-once. Oracle = q110's SQL VERBATIM: batched
    // ingest must reproduce the one-shot clustering — band membership
    // is per-image, so this holds even in the band-limited regime
    // (maxHamming 6 > the pigeonhole bound 3).
    "q151_incremental_image" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      import graft.multimodal.{IncrementalPerceptual, Perceptual}
      val fps = Perceptual.dHashes(Round7Queries.bmpMedia(s, dir))
        .localCheckpoint()
      val (i0, p0) = IncrementalPerceptual.build(
        fps.filter(col("id") % 3 === 0))
      val (i1, p1) = IncrementalPerceptual.addBatch(i0,
        fps.filter(col("id") % 3 === 1))
      val (i2, p2) = IncrementalPerceptual.addBatch(i1,
        fps.filter(col("id") % 3 === 2))
      IncrementalPerceptual.clusters(i2,
          p0.unionByName(p1).unionByName(p2))
        .orderBy(col("id"))
    }),

    // ...and its STREAMING door (the fifth: text q118, embeddings
    // q119, audio q132, spans q150, images q152): BMP payloads land
    // as a 3-file staging directory, each micro-batch is decoded +
    // dHashed once and folds into IncrementalPerceptual. Oracle =
    // q110's SQL VERBATIM while the stream's file batching differs
    // from q151's %3 — batching-independence hash-checked.
    "q152_stream_image_ingest" -> ((s, dir) => {
      import java.nio.file.Files
      implicit val sp: SparkSession = s
      import graft.multimodal.IncrementalPerceptual
      val stage = Files.createTempDirectory("graft-q152-landing").toString
      val cp = Files.createTempDirectory("graft-q152-cp").toString
      Round7Queries.bmpMedia(s, dir).toDF()
        .repartition(3, col("doc_id"))
        .write.mode("overwrite").parquet(stage)
      val stream = s.readStream.schema(s.read.parquet(stage).schema)
        .option("maxFilesPerTrigger", 1).parquet(stage)
      val (idx, pairs) = graft.streaming.StreamingImage.ingest(stream, cp)
      Round7bQueries.rmTree(stage); Round7bQueries.rmTree(cp)
      IncrementalPerceptual.clusters(idx, pairs).orderBy(col("id"))
    }),

    // The unified purge sweep over the two index families q139 didn't
    // exercise, end to end THROUGH STORAGE: build the winnowing
    // provenance index (over documents) and the perceptual image
    // index (over q110's corpus) on each corpus's %4!=1 slice,
    // publish both (history kept), forget every id divisible by 3 in
    // ONE Purge.forget call, reload from the purged catalog, and
    // ingest the %4==1 batch into each. The emitted winnow matches +
    // image pairs must equal one-shot runs over (allowed = batch OR
    // id%3<>0), restricted to batch-touching pairs — proving the
    // purge removed the rows from the STORED relations in both
    // families.
    "q153_purge_media" -> ((s, dir) => {
      import java.nio.file.Files
      implicit val sp: SparkSession = s
      import graft.multimodal.{IncrementalPerceptual, Perceptual}
      import graft.text.IncrementalWinnow
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"))
      val hashes = Perceptual.dHashes(Round7Queries.bmpMedia(s, dir))
        .localCheckpoint()
      val (wIdx, _) = IncrementalWinnow.build(
        docs.filter(col("doc_id") % 4 =!= 1), "doc_id", "text")
      val (iIdx, _) = IncrementalPerceptual.build(
        hashes.filter(col("id") % 4 =!= 1))
      val root = Files.createTempDirectory("graft-q153").toString
      val cat = new graft.catalog.ParquetCatalog(s, root)
      IncrementalWinnow.save(wIdx, cat, "w", vacuumHistory = false)
      IncrementalPerceptual.save(iIdx, cat, "img", vacuumHistory = false)
      val purgeIds = docs.select(col("doc_id").as("pid"))
        .unionByName(hashes.select(col("id").as("pid")))
        .filter(col("pid") % 3 === 0)
      graft.pipeline.Purge.forget(cat, purgeIds, "pid",
        winnow = Seq("w"), image = Seq("img"))
      val (_, wp) = IncrementalWinnow.addBatch(
        IncrementalWinnow.load(cat, "w"),
        docs.filter(col("doc_id") % 4 === 1), "doc_id", "text")
      val (_, ip) = IncrementalPerceptual.addBatch(
        IncrementalPerceptual.load(cat, "img"),
        hashes.filter(col("id") % 4 === 1))
      val out = wp.select(lit("winnow").as("family"), col("a"), col("b"))
        .unionByName(ip.select(lit("image").as("family"), col("a"),
          col("b")))
        .orderBy(col("family"), col("a"), col("b")).localCheckpoint()
      Round7bQueries.rmTree(root)
      out
    }),

    // DSIR-style importance resampling: raw corpus = all documents;
    // target = the srcnum%4==1 sources. Hashed unigram+bigram
    // likelihood ratios (exact scaled integers, clamped), per-doc
    // mean-ratio importance, and the deterministic hash-gate keep at
    // threshold min(Unit, keepPpm·imp/mean_imp) — sampling
    // probability proportional to how target-like the document is.
    "q154_dsir_resample" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("source"))
      val srcnum = substring(col("source"), 4, 10).cast("int")
      graft.pipeline.Dsir.resample(
          docs.select(col("doc_id"), col("text")),
          docs.filter(srcnum % 4 === 1).select(col("doc_id"), col("text")),
          "doc_id", "text", dim = DsirDim, keepPpm = DsirKeepPpm)
        .orderBy(col("doc_id"))
    })
  )

  // ---- oracle SQL ----------------------------------------------------

  val oracleSql: Map[String, String] = Map(

    // q110's SQL verbatim — batched ingest must reproduce the
    // one-shot perceptual clustering
    "q151_incremental_image" ->
      Round7Queries.oracleSql("q110_perceptual_dedup"),

    // the same replay under per-file batching — streamed == batched
    "q152_stream_image_ingest" ->
      Round7Queries.oracleSql("q110_perceptual_dedup"),

    // One-shot replays of both post-purge states: winnow matches
    // (q149's arithmetic) and image pairs (q110's) over
    // allowed = (id%4=1 OR id%3<>0), restricted to batch-touching
    // pairs — exactly what the reloaded-then-grown indexes must emit
    // iff the purge removed the rows from storage.
    "q153_purge_media" ->
      s"""WITH ${Round7Queries.winnowFpCtes()},
         |wallow AS (SELECT * FROM fps
         |  WHERE doc_id % 4 = 1 OR doc_id % 3 <> 0),
         |wm AS (SELECT l.doc_id AS a, r.doc_id AS b
         |  FROM wallow l JOIN wallow r
         |    ON l.fp = r.fp AND l.doc_id < r.doc_id
         |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
         |${Round7Queries.imageDhCtesSql},
         |iallow AS (SELECT rid, dhash FROM dh
         |  WHERE rid % 4 = 1 OR rid % 3 <> 0),
         |ib AS (SELECT rid, dhash, bb.band,
         |    (dhash >> (bb.band * 14)) & 16383 AS v
         |  FROM iallow, (SELECT unnest(generate_series(0, 3)) AS band) bb),
         |ip AS (SELECT a, b FROM (
         |    SELECT DISTINCT x.rid AS a, y.rid AS b,
         |      x.dhash AS ha, y.dhash AS hb
         |    FROM ib x JOIN ib y ON x.band = y.band AND x.v = y.v
         |      AND x.rid < y.rid)
         |  WHERE bit_count(xor(ha, hb)) <= 6)
         |SELECT family, a, b FROM (
         |  SELECT 'winnow' AS family, a, b FROM wm
         |    WHERE a % 4 = 1 OR b % 4 = 1
         |  UNION ALL
         |  SELECT 'image', a, b FROM ip
         |    WHERE a % 4 = 1 OR b % 4 = 1)
         |ORDER BY family, a, b""".stripMargin,

    // the full DSIR replay: tokenize, unigram+bigram occurrences,
    // hashed buckets, smoothed clamped integer ratios over the dense
    // bucket range, per-doc mean importance, 1-row mean normalizer,
    // threshold + md5 hash gate — every division a nonnegative
    // integer floor (`//` == Spark `div`)
    "q154_dsir_resample" -> {
      val toksExpr =
        """list_filter(string_split_regex(text, '\s+'), x -> x <> '')"""
      val gateSql = graft.functions.PortableHash
        .hash60BaseSql("'dsir:' || sc.doc_id::VARCHAR")
      s"""WITH ts AS (SELECT doc_id, source, $toksExpr AS t FROM documents),
         |occ AS (
         |  SELECT doc_id, source, unnest(t) AS feat FROM ts
         |  UNION ALL
         |  SELECT doc_id, source, t[i] || ' ' || t[i+1] AS feat
         |  FROM ts, UNNEST(generate_series(1, len(t) - 1)) AS u(i)),
         |feats AS (SELECT doc_id, source,
         |    ${graft.text.TextClassify.bucketSql("feat", DsirDim)} AS bucket
         |  FROM occ),
         |rn AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM feats GROUP BY bucket),
         |tn AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM feats WHERE CAST(substr(source, 4) AS INT) % 4 = 1
         |  GROUP BY bucket),
         |ratios AS (SELECT g.range AS bucket,
         |    LEAST(${graft.pipeline.Dsir.RatioCap},
         |      ((COALESCE(t.c, 0) + 1) * ${graft.pipeline.Dsir.Scale})
         |        // (COALESCE(r.c, 0) + 1)) AS ratio
         |  FROM range($DsirDim) g
         |  LEFT JOIN rn r ON r.bucket = g.range
         |  LEFT JOIN tn t ON t.bucket = g.range),
         |sc AS (SELECT f.doc_id,
         |    CAST(COUNT(*) AS BIGINT) AS n_feats,
         |    CAST(SUM(ra.ratio) AS BIGINT) // CAST(COUNT(*) AS BIGINT)
         |      AS imp
         |  FROM feats f JOIN ratios ra ON ra.bucket = f.bucket
         |  GROUP BY f.doc_id),
         |m AS (SELECT GREATEST(1,
         |    CAST(SUM(imp) AS BIGINT) // CAST(COUNT(*) AS BIGINT))
         |  AS mean_imp FROM sc)
         |SELECT sc.doc_id, sc.n_feats, sc.imp,
         |  CAST(LEAST(1000000, ($DsirKeepPpm * sc.imp) // m.mean_imp)
         |    AS BIGINT) AS threshold,
         |  (($gateSql % 1000000)
         |    < LEAST(1000000, ($DsirKeepPpm * sc.imp) // m.mean_imp))
         |    AS keep
         |FROM sc, m
         |ORDER BY sc.doc_id""".stripMargin
    }
  )
}
