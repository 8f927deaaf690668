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
    }),

    // Semantic-index RETRAIN: q111's three-batch ingest (centroids
    // frozen at batch 0), then IncrementalSemantic.retrain re-trains
    // c=32 centroids from the accumulated member set and re-buckets
    // every member — the cost re-balance the drift probe recommends
    // (SEMANTIC_DRIFT_r9: frozen centroids lose no recall but their
    // seed-sized buckets hold N× the population). The oracle replays
    // the ENTIRE retrain relationally: md5-ordered init + both Lloyd
    // iterations + the final argmin, trained over the full corpus —
    // retrain(index) == build(all surviving vectors) is the contract.
    "q140_semantic_retrain" -> ((s, dir) => {
      import graft.similarity.IncrementalSemantic
      val emb = Tables(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val repA = emb.filter(col("vec_id") % 7 === 0)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      val repB = emb.filter(col("vec_id") % 11 === 0)
        .select((col("vec_id") + 2000000L).as("vec_id"),
          transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
      val full = emb.unionByName(repA).unionByName(repB)
      def batch(b: Int) = full.filter(col("vec_id") % 3 === b)
      val (i0, _) = IncrementalSemantic.build(batch(0), "vec_id",
        "embedding", threshold = 0.99, c = ExtendedQueries.IvfC,
        iters = ExtendedQueries.IvfIters)
      val (i1, _) = IncrementalSemantic.addBatch(i0, batch(1), "vec_id",
        "embedding", threshold = 0.99)
      val (i2, _) = IncrementalSemantic.addBatch(i1, batch(2), "vec_id",
        "embedding", threshold = 0.99)
      val r = IncrementalSemantic.retrain(i2, c = RetrainC,
        iters = ExtendedQueries.IvfIters)
      r.members.select(col("id").as("vec_id"), col("bucket"))
        .orderBy(col("vec_id"))
    }),

    // Streaming SCD-2 ingest: the reference's flagship merge driven
    // through the file-source streaming door (the trilogy's fourth
    // member — documents q118/q126, embeddings q119, audio q132, and
    // now the DIMENSION). Two staged snapshots land as single ordered
    // files (explicit mtimes — CDC streams are ordered, and the file
    // source drains oldest-first); StreamingScd.writer dedupes each
    // batch keep-latest and merges it into a ParquetCatalog-held
    // dimension with a per-batch asOf, exactly-once via the catalog's
    // atomic versioned publish. The oracle replays BOTH merges as
    // chained 6-branch SQL (mergeStepCtes) — streamed sequential
    // merging == the one-shot two-step replay, hash-checked.
    "q141_stream_scd" -> ((s, dir) => {
      import java.nio.file.{Files, Path}
      import java.nio.file.attribute.FileTime
      import java.sql.Timestamp
      import graft.scd.MergeOptions
      import org.apache.spark.sql.streaming.Trigger
      val stage = Files.createTempDirectory("graft-q141-landing")
      val cp = Files.createTempDirectory("graft-q141-cp").toString
      val root = Files.createTempDirectory("graft-q141-cat").toString
      val cat = new graft.catalog.ParquetCatalog(s, root)
      val prod0 = ScdQueries.production(s, dir)
      cat.create("dim", prod0.schema)
      cat.overwrite("dim", prod0)
      def land(df: DataFrame, name: String, mtimeMs: Long): Unit = {
        val tmp = Files.createTempDirectory("graft-q141-snap").toString
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        val dst = stage.resolve(name)
        Files.move(part.toPath, dst)
        Files.setLastModifiedTime(dst, FileTime.fromMillis(mtimeMs))
        Round7bQueries.rmTree(tmp)
      }
      land(ScdQueries.staging(s, dir).withColumn("seq", lit(1L)),
        "snap0.parquet", 1700000000000L)
      land(secondSnapshot(s, dir).withColumn("seq", lit(2L)),
        "snap1.parquet", 1700000100000L)
      val stream = s.readStream
        .schema(s.read.parquet(stage.toString).schema)
        .option("maxFilesPerTrigger", 1).parquet(stage.toString)
      val asOfs = Map(
        0L -> Timestamp.valueOf("2024-07-01 00:00:00"),
        1L -> Timestamp.valueOf("2024-08-01 00:00:00"))
      val query = graft.streaming.StreamingScd.writer(
          stream, ScdQueries.schema,
          load = _ => cat.table("dim"),
          save = df => cat.overwrite("dim", df),
          eventTimeCol = "seq",
          asOfForBatch = asOfs(_),
          mergeOpts = ts => MergeOptions(ts, highDate = ScdQueries.highTs))
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .start()
      query.awaitTermination()
      val out = cat.table("dim")
        .orderBy(col("c_custkey"), col("scd_version")).localCheckpoint()
      Round7bQueries.rmTree(stage.toString); Round7bQueries.rmTree(cp)
      Round7bQueries.rmTree(root)
      out
    }),

    // Mixture UPSAMPLING: sources whose ablated rate exceeds one epoch
    // (q93/q134 are the downsample half). Per-source weights span
    // 0.25x..2.65x (srcnum%4): the 0.25x sources exercise the pure-
    // fractional path (zero full copies — most rows vanish), the
    // 2.65x sources emit 2 or 3 tagged copies per row. Copy count is
    // an exact integer function of (source, id) — the oracle unnests
    // generate_series over the same arithmetic.
    "q142_upsample" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"))
      val srcnum = substring(col("source"), 4, 10).cast("int")
      val docsW = docs.withColumn("w",
        lit(250000L) + (srcnum % 4).cast("long") * 800000L)
      graft.pipeline.Mixture.upsample(docsW, "doc_id", col("w"))
        .orderBy(col("doc_id"), col("rep"))
    }),

    // EXACT stratified split: per source, exactly floor(0.8·n_s) train
    // and floor(0.9·n_s)-floor(0.8·n_s) val rows — q115's hash split
    // is proportional only in expectation. Per-source rank via the
    // two-phase prefix sum (source-partitioned — slice-sized windows,
    // no per-source funnel), boundaries as exact integer ppm cuts.
    "q143_stratified_split" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"))
      graft.pipeline.Splits.stratifiedExact(docs, "doc_id", "source")
        .select(col("doc_id"), col("source"), col("src_rank"),
          col("split"))
        .orderBy(col("doc_id"))
    }),

    // One-call TRAINING-DATA RELEASE: the whole front-to-back decision
    // chain — gates -> exact dedup -> near-dup removal at 0.5 ->
    // near-dup DECONTAMINATION against the q120 eval corpus ->
    // leakage-safe split clustered at the LOOSER 0.3 threshold (one
    // shingle pass serves both thresholds) -> per-doc token counts.
    // Output: the per-document release manifest. The oracle chains
    // every verified stage replay: q46's gate+exact CTEs, the jaccard
    // relation read at both thresholds, two recursive CC chains, the
    // q120-style cross-corpus contamination join, and the q115 split
    // hash.
    "q144_release_manifest" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"))
      val ev = docs.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 5000000L).as("doc_id"), col("text"))
        .unionByName(docs.filter(col("doc_id") % 17 === 0)
          .select((col("doc_id") + 6000000L).as("doc_id"),
            concat(col("text"), lit(" zz tail marker")).as("text")))
        .unionByName(docs.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 7000000L).as("doc_id"),
            concat(lit("fresh eval doc "), col("doc_id").cast("string"),
              lit(" with wholly unique content")).as("text")))
      graft.pipeline.CorpusPipeline.release(
          PipelineQueries.corpus(s, dir), ev, "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    // Classifier TRAINING in the engine: batch perceptron over hashed
    // bag-of-words features — the learn side of q124's inference.
    // Labeled corpus = real documents (+1) vs generated junk (-1);
    // 3 full-batch rounds of exact-integer updates (y·score <= 0 →
    // misclassified; weights += Σ y·count per bucket). The oracle
    // unrolls the rounds as CTEs, like BPE merges and Lloyd steps —
    // model training is part of the verified contract, not trusted
    // engine state. Output: the dense (bucket, weight) model relation.
    "q145_perceptron_train" -> ((s, dir) => {
      graft.text.TextClassify.trainPerceptron(labeledCorpus(s, dir),
        "doc_id", "text", "y", dim = PercDim, rounds = PercRounds)
        .orderBy(col("bucket"))
    }),

    // ...and the trained model APPLIED: train (q145's exact rounds),
    // then score the same labeled corpus through q124's inference door
    // (mean-weight threshold 0). Train -> infer end to end in one
    // declared query; per-doc scores hash-checked.
    "q146_perceptron_gate" -> ((s, dir) => {
      val lab = labeledCorpus(s, dir)
      val wts = graft.text.TextClassify.trainPerceptron(lab,
        "doc_id", "text", "y", dim = PercDim, rounds = PercRounds)
      graft.text.TextClassify.hashedLinear(lab, "doc_id", "text",
          wts, PercDim, thresholdNum = 0L, thresholdDen = 1L)
        .orderBy(col("doc_id"))
    }),

    // The RELEASE pipeline as a continuous ingest: q126's streaming
    // door collects the LOOSE (0.3) pair set while gating and folding
    // each landed batch, then resolveRelease replays q144's whole
    // decision chain from the accumulated state — exact dedup, the
    // 0.5 dedup subset by filter, eval decontamination, loose-cluster
    // split, token counts. Oracle = q144's SQL VERBATIM while the
    // stream's file batching differs: "streamed release == one-shot
    // release" is a hash-checked contract.
    "q147_stream_release" -> ((s, dir) => {
      import java.nio.file.Files
      val stage = Files.createTempDirectory("graft-q147-landing").toString
      val cp = Files.createTempDirectory("graft-q147-cp").toString
      val cfg = graft.pipeline.CorpusPipeline.Config(
        jaccardThreshold = 0.3)
      PipelineQueries.corpus(s, dir)
        .repartition(3, col("doc_id"))
        .write.mode("overwrite").parquet(stage)
      val stream = s.readStream.schema(s.read.parquet(stage).schema)
        .option("maxFilesPerTrigger", 1).parquet(stage)
      val (idx, gated, pairs) = graft.streaming.StreamingCorpus.ingest(
        stream, "doc_id", "text", cp, cfg)
      Round7bQueries.rmTree(stage); Round7bQueries.rmTree(cp)
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"))
      val ev = docs.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 5000000L).as("doc_id"), col("text"))
        .unionByName(docs.filter(col("doc_id") % 17 === 0)
          .select((col("doc_id") + 6000000L).as("doc_id"),
            concat(col("text"), lit(" zz tail marker")).as("text")))
        .unionByName(docs.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 7000000L).as("doc_id"),
            concat(lit("fresh eval doc "), col("doc_id").cast("string"),
              lit(" with wholly unique content")).as("text")))
      // decontamination reuses the ingest index's accumulated shingle
      // relation instead of re-shingling the released corpus
      graft.streaming.StreamingCorpus.resolveRelease(
          gated, pairs, ev, "doc_id", "text",
          trainShingles = Some(idx.shingles))
        .orderBy(col("doc_id"))
    }),

    // TOKEN-balanced shard assignment: the token tape (docs in
    // salted-hash order) cut into 8 contiguous spans — every shard
    // carries ~total/8 tokens regardless of the document-length tail,
    // where row-count dealing leaves shards far apart. Two-phase
    // prefix sum with a token-weight value; exact integer cuts.
    "q148_token_shards" -> ((s, dir) => {
      graft.pipeline.Packing.tokenShards(
          Tables(s, dir, "documents"), "doc_id", "text", numShards = 8)
        .orderBy(col("doc_id"))
    }),

    // Incremental WINNOWING provenance index: the q116/q117 span
    // machinery under the IncrementalLsh ingest contract — three %3
    // batches, only the batch fingerprinted per fold, matches from
    // new-vs-(stored+new) fp collisions, exactly-once with full
    // shared-mass and extents (a pair's shared-fp set is fixed once
    // both docs exist). The batched union must equal the one-shot
    // Winnow.matches — the oracle replays exactly that (uncapped;
    // the hot-fp cap is a full-corpus property, resolve-time only).
    "q149_incremental_winnow" -> ((s, dir) => {
      import graft.text.IncrementalWinnow
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"))
      def batch(b: Int) = docs.filter(col("doc_id") % 3 === b)
      val (i0, p0) = IncrementalWinnow.build(batch(0), "doc_id", "text")
      val (i1, p1) = IncrementalWinnow.addBatch(i0, batch(1), "doc_id",
        "text")
      val (_, p2) = IncrementalWinnow.addBatch(i1, batch(2), "doc_id",
        "text")
      p0.unionByName(p1).unionByName(p2)
        .orderBy(col("a"), col("b"))
    }),

    // ...and its STREAMING door (the fourth: text q118, embeddings
    // q119, audio q132, spans q150): documents land as a 3-file
    // staging directory, each micro-batch fingerprints only itself
    // and folds into IncrementalWinnow. Oracle = q149's one-shot SQL
    // VERBATIM while the stream's file batching differs from q149's
    // %3 — streamed provenance == batch provenance, hash-checked.
    "q150_stream_winnow" -> ((s, dir) => {
      import java.nio.file.Files
      val stage = Files.createTempDirectory("graft-q150-landing").toString
      val cp = Files.createTempDirectory("graft-q150-cp").toString
      Tables(s, dir, "documents").select(col("doc_id"), col("text"))
        .repartition(3, col("doc_id"))
        .write.mode("overwrite").parquet(stage)
      val stream = s.readStream.schema(s.read.parquet(stage).schema)
        .option("maxFilesPerTrigger", 1).parquet(stage)
      val (_, matches) = graft.streaming.StreamingWinnow.ingest(
        stream, "doc_id", "text", cp)
      val out = matches.orderBy(col("a"), col("b")).localCheckpoint()
      Round7bQueries.rmTree(stage); Round7bQueries.rmTree(cp)
      out
    })
  )

  /** q145/q146 labeled corpus: every document as a positive, plus a
    * generated junk negative per document (repeat-count and ref tag
    * derived from the original id — SQL-replicable on both engines).
    */
  private def labeledCorpus(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"), col("text"), lit(1L).as("y"))
    val junk = Tables(s, dir, "documents").select(
      (col("doc_id") + 9000000L).as("doc_id"),
      concat(
        expr("repeat('the offer is free buy now click here ', " +
          "CAST(3 + doc_id % 4 AS INT))"),
        lit("ref "), col("doc_id").cast("string")).as("text"),
      lit(-1L).as("y"))
    docs.unionByName(junk)
  }

  /** q145/q146 model geometry. */
  private val PercDim = 256
  private val PercRounds = 3

  /** q141's second CDC wave (fresh derivation from `customer`, so the
    * %3/%4/%6 keys changed by wave 1 revert — more B4/B5 closures):
    * %9=0 keys absent (B1 carries), %5=0 acctbal+25 and %11=0
    * segment change (Type-2), %8=0 lower-cases the name (Type-1),
    * %12=0 keys reappear offset by 1,000,000 (B6 inserts).
    */
  private def secondSnapshot(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables(s, dir, "customer")
    cust.filter(col("c_custkey") % 9 =!= 0)
      .select(
        col("c_custkey"),
        when(col("c_custkey") % 8 === 0, lower(col("c_name")))
          .otherwise(col("c_name")).as("c_name"),
        when(col("c_custkey") % 5 === 0, col("c_acctbal") + 25)
          .otherwise(col("c_acctbal")).as("c_acctbal"),
        when(col("c_custkey") % 11 === 0, lit("STREAMING"))
          .otherwise(col("c_mktsegment")).as("c_mktsegment"))
      .unionByName(cust.filter(col("c_custkey") % 12 === 0)
        .select((col("c_custkey") + 1000000).as("c_custkey"),
          col("c_name"), col("c_acctbal"), col("c_mktsegment")))
  }

  /** q140's grown centroid count (2x the q111 seed c — the c ∝ N path). */
  private val RetrainC = 32

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
         |ORDER BY a, b""".stripMargin,

    // Full relational replay of the retrain: q111's planted corpus,
    // quantized (qzall); training reads qz = the WHOLE corpus (retrain
    // trains on everything indexed — vs q111 where qz is the batch-0
    // slice) with c=32 md5-ordered seeds and the same two exact-
    // integer Lloyd steps; final assignment argmin over the retrained
    // centroids. retrain() re-quantizes from the stored double view
    // `e`, which equals quantization of the original float column, so
    // every step replays bit-identically.
    "q140_semantic_retrain" ->
      s"""WITH
         |base AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
         |emb2 AS (
         |  SELECT vec_id, e FROM base
         |  UNION ALL
         |  SELECT vec_id + 1000000, e FROM base WHERE vec_id % 7 = 0
         |  UNION ALL
         |  SELECT vec_id + 2000000, list_transform(e, x -> x * 2.0)
         |  FROM base WHERE vec_id % 11 = 0),
         |qzall AS (SELECT vec_id, e,
         |    list_transform(e, x -> round(x * 127.0 / mab)) AS qd
         |  FROM (SELECT vec_id, e,
         |          list_max(list_transform(e, x -> abs(x))) AS mab FROM emb2)
         |  WHERE mab > 0),
         |qz AS (SELECT * FROM qzall),
         |c0 AS (SELECT cluster, cent FROM (
         |  SELECT qd AS cent,
         |    ROW_NUMBER() OVER (ORDER BY h, vec_id) - 1 AS cluster
         |  FROM (SELECT vec_id, qd,
         |          ${graft.functions.PortableHash
                      .hash60BaseSql("vec_id::VARCHAR")} AS h
         |        FROM qz))
         |  WHERE cluster < $RetrainC),
         |${(1 to ExtendedQueries.IvfIters)
             .map(ExtendedQueries.ivfStepSql).mkString(",\n")},
         |cb AS (SELECT vec_id, cluster AS bucket FROM (
         |  SELECT z.vec_id, c.cluster,
         |    ROW_NUMBER() OVER (PARTITION BY z.vec_id
         |      ORDER BY ${distSql("z.qd", "c.cent")} ASC, c.cluster ASC) AS rn
         |  FROM qzall z CROSS JOIN c${ExtendedQueries.IvfIters} c)
         |  WHERE rn = 1)
         |SELECT vec_id, bucket FROM cb ORDER BY vec_id""".stripMargin,

    // Chained two-step replay of the streamed merges: step 1 is q13's
    // merge (prod + wave-1 staging at 2024-07-01), step 2 merges the
    // second wave into step 1's output at 2024-08-01 — the streamed
    // dimension must equal the sequential batch replay exactly.
    "q141_stream_scd" ->
      s"""WITH prod AS (
         |  ${ScdQueries.prodSql}
         |), stag AS (
         |  ${ScdQueries.stagSql}
         |), ${ScdQueries.mergeStepCtes("m1", "prod", "stag",
             "TIMESTAMP '2024-07-01 00:00:00'")},
         |stag2 AS (
         |  SELECT c_custkey,
         |    CASE WHEN c_custkey % 8 = 0 THEN lower(c_name) ELSE c_name END AS c_name,
         |    CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 25 ELSE c_acctbal END AS c_acctbal,
         |    CASE WHEN c_custkey % 11 = 0 THEN 'STREAMING' ELSE c_mktsegment END AS c_mktsegment
         |  FROM customer WHERE c_custkey % 9 <> 0
         |  UNION ALL
         |  SELECT c_custkey + 1000000, c_name, c_acctbal, c_mktsegment
         |  FROM customer WHERE c_custkey % 12 = 0
         |), ${ScdQueries.mergeStepCtes("m2", "m1out", "stag2",
             "TIMESTAMP '2024-08-01 00:00:00'")}
         |SELECT dim_id, c_custkey, c_name, c_acctbal, c_mktsegment,
         |  scd_version, scd_start_date, scd_end_date, scd_active
         |FROM m2out
         |ORDER BY c_custkey, scd_version""".stripMargin,

    // floor/mod in exact integer arithmetic (// on BIGINT), the salted
    // md5 gate for the fractional copy, generate_series for the
    // replication — empty series (n_copies = 0) yields no rows.
    "q142_upsample" ->
      s"""WITH d AS (SELECT doc_id, source,
         |    250000 + CAST(CAST(substr(source, 4) AS INT) % 4 AS BIGINT)
         |      * 800000 AS w
         |  FROM documents),
         |n AS (SELECT doc_id, source, w,
         |    w // 1000000 + CASE WHEN ${graft.functions.PortableHash
                 .hash60BaseSql("'up:' || doc_id::VARCHAR")} % 1000000
         |        < w % 1000000 THEN 1 ELSE 0 END AS n_copies
         |  FROM d)
         |SELECT doc_id, source, w,
         |  CAST(unnest(generate_series(0, n_copies - 1)) AS BIGINT) AS rep
         |FROM n
         |ORDER BY doc_id, rep""".stripMargin,

    // Per-source salted-hash rank + exact integer ppm boundary cuts.
    "q143_stratified_split" ->
      s"""WITH d AS (SELECT doc_id, source,
         |    ${graft.functions.PortableHash
                .hash60BaseSql("'strat:' || doc_id::VARCHAR")} AS h
         |  FROM documents),
         |r AS (SELECT doc_id, source,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY h, doc_id) AS BIGINT) AS src_rank,
         |    COUNT(*) OVER (PARTITION BY source) AS n
         |  FROM d)
         |SELECT doc_id, source, src_rank,
         |  CASE WHEN src_rank <= (n * 800000) // 1000000 THEN 'train'
         |       WHEN src_rank <= (n * 900000) // 1000000 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM r ORDER BY doc_id""".stripMargin,

    // q46's gate+exact chain, one jaccard relation read at 0.5 (dedup
    // CC) and 0.3 (split CC over released docs), the q120 cross-corpus
    // contamination join restricted to survivors, the q115 cluster
    // hash split, and the q96 token-count expression.
    "q144_release_manifest" -> oracleSqlQ144,

    // streamed release == one-shot release, hash-checked
    "q147_stream_release" -> oracleSqlQ144,

    // inclusive token prefix over the salted-hash order, integer cuts;
    // windowed BIGINT sums cast back from DuckDB's HUGEINT
    "q148_token_shards" ->
      s"""WITH d AS (SELECT doc_id,
         |    CAST(len(list_filter(string_split_regex(text, '\\s+'),
         |      x -> x <> '')) AS BIGINT) AS n_tok,
         |    ${graft.functions.PortableHash
                .hash60BaseSql("'shard:' || doc_id::VARCHAR")} AS h
         |  FROM documents),
         |d2 AS (SELECT * FROM d WHERE n_tok > 0),
         |r AS (SELECT doc_id, n_tok,
         |    CAST(SUM(n_tok) OVER (ORDER BY h, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cum,
         |    CAST(SUM(n_tok) OVER () AS BIGINT) AS total
         |  FROM d2)
         |SELECT doc_id, n_tok,
         |  CAST(((cum - n_tok) * 8) // total AS BIGINT) AS shard
         |FROM r ORDER BY doc_id""".stripMargin,

    // one-shot uncapped Winnow.matches over the full corpus — the
    // batched union must reproduce it exactly (q117's SQL without the
    // df-16 keep filter)
    "q149_incremental_winnow" -> oracleSqlQ149,

    // streamed provenance == batch provenance, hash-checked
    "q150_stream_winnow" -> oracleSqlQ149,

    "q145_perceptron_train" ->
      s"""WITH ${perceptronCtes(PercDim, PercRounds)}
         |SELECT bucket, weight FROM w$PercRounds ORDER BY bucket""".stripMargin,

    // the trained rounds + q124's inference arithmetic over the same
    // feature matrix (n_tokens = Σ cnt; keep = score >= 0)
    "q146_perceptron_gate" ->
      s"""WITH ${perceptronCtes(PercDim, PercRounds)}
         |SELECT x.doc_id,
         |  CAST(SUM(x.cnt) AS BIGINT) AS n_tokens,
         |  CAST(SUM(x.cnt * COALESCE(w.weight, 0)) AS BIGINT) AS score,
         |  (CAST(SUM(x.cnt * COALESCE(w.weight, 0)) AS BIGINT) >= 0)
         |    AS keep
         |FROM xm x LEFT JOIN w$PercRounds w ON w.bucket = x.bucket
         |GROUP BY x.doc_id
         |ORDER BY x.doc_id""".stripMargin
  )

  /** q149's one-shot uncapped matches replay — shared verbatim by
    * q150 (streamed provenance must equal the batched ingest). */
  private lazy val oracleSqlQ149: String =
    s"""WITH ${Round7Queries.winnowFpCtes()}
         |SELECT l.doc_id AS a, r.doc_id AS b,
         |  CAST(COUNT(*) AS BIGINT) AS n_shared,
         |  MIN(l.pos) AS a_from, MAX(l.pos) AS a_to,
         |  MIN(r.pos) AS b_from, MAX(r.pos) AS b_to
         |FROM fps l JOIN fps r ON l.fp = r.fp AND l.doc_id < r.doc_id
         |GROUP BY 1, 2 HAVING COUNT(*) >= 2
         |ORDER BY a, b""".stripMargin

  /** q144's full release replay — shared verbatim by q147 (streamed
    * release must equal the one-shot). */
  private lazy val oracleSqlQ144: String = {
      import PipelineQueries.{corpusSql, gateExactCtesSql, shinglesSql,
        sigBucketsSql, minhashCtesSql}
      val nTokSql =
        """CAST(len(list_filter(string_split_regex(r.text, '\s+'),
          |    x -> x <> '')) AS BIGINT)""".stripMargin
      val splitHash = graft.functions.PortableHash
        .hash60BaseSql("cluster::VARCHAR")
      s"""WITH RECURSIVE $corpusSql,
         |$gateExactCtesSql,
         |${shinglesSql("ex")},
         |$minhashCtesSql,
         |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         |common AS (
         |  SELECT c.a, c.b, count(*) AS n_common
         |  FROM cand c
         |  JOIN sh x ON x.doc_id = c.a
         |  JOIN sh y ON y.doc_id = c.b AND y.shh = x.shh
         |  GROUP BY c.a, c.b),
         |jac AS (SELECT cm.a, cm.b,
         |    cm.n_common::DOUBLE / (sa.n_sh + sb.n_sh - cm.n_common) AS j
         |  FROM common cm
         |  JOIN sizes sa ON sa.doc_id = cm.a
         |  JOIN sizes sb ON sb.doc_id = cm.b),
         |edges5 AS (
         |  SELECT a AS src, b AS dst FROM jac WHERE j >= 0.5::DOUBLE
         |  UNION SELECT b, a FROM jac WHERE j >= 0.5::DOUBLE),
         |reach5(node, lab) AS (
         |  SELECT src, src FROM edges5
         |  UNION
         |  SELECT e2.dst, r.lab FROM reach5 r JOIN edges5 e2 ON e2.src = r.node),
         |losers5 AS (
         |  SELECT node AS doc_id FROM reach5
         |  GROUP BY node HAVING node <> min(lab)),
         |surv AS (SELECT e.* FROM ex e
         |  WHERE NOT EXISTS (SELECT 1 FROM losers5 l WHERE l.doc_id = e.doc_id)),
         |ev AS (
         |  SELECT doc_id + 5000000 AS doc_id, text FROM documents
         |  WHERE doc_id % 13 = 0
         |  UNION ALL
         |  SELECT doc_id + 6000000, text || ' zz tail marker'
         |  FROM documents WHERE doc_id % 17 = 0
         |  UNION ALL
         |  SELECT doc_id + 7000000, 'fresh eval doc ' || doc_id::VARCHAR
         |    || ' with wholly unique content'
         |  FROM documents WHERE doc_id % 5 = 0),
         |${shinglesSql("ev", "e")},
         |${sigBucketsSql("e")},
         |candx AS (
         |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
         |  FROM buckets l JOIN bucketse r
         |    ON l.band = r.band AND l.bucket = r.bucket
         |  WHERE l.doc_id IN (SELECT doc_id FROM surv)),
         |sizese AS (SELECT doc_id, count(*) AS nb FROM she GROUP BY doc_id),
         |commonx AS (
         |  SELECT c.a, c.b, count(*) AS n_common
         |  FROM candx c
         |  JOIN sh x ON x.doc_id = c.a
         |  JOIN she y ON y.doc_id = c.b AND y.shh = x.shh
         |  GROUP BY c.a, c.b),
         |hitx AS (SELECT DISTINCT cm.a AS doc_id
         |  FROM commonx cm
         |  JOIN sizes sa ON sa.doc_id = cm.a
         |  JOIN sizese sb ON sb.doc_id = cm.b
         |  WHERE cm.n_common::DOUBLE / (sa.n_sh + sb.nb - cm.n_common)
         |    >= 0.5::DOUBLE),
         |rel AS (SELECT s.* FROM surv s
         |  WHERE NOT EXISTS (SELECT 1 FROM hitx h WHERE h.doc_id = s.doc_id)),
         |edges3 AS (
         |  SELECT a AS src, b AS dst FROM jac
         |  WHERE j >= 0.3::DOUBLE
         |    AND a IN (SELECT doc_id FROM rel)
         |    AND b IN (SELECT doc_id FROM rel)
         |  UNION SELECT b, a FROM jac
         |  WHERE j >= 0.3::DOUBLE
         |    AND a IN (SELECT doc_id FROM rel)
         |    AND b IN (SELECT doc_id FROM rel)),
         |reach3(node, lab) AS (
         |  SELECT src, src FROM edges3
         |  UNION
         |  SELECT e2.dst, r.lab FROM reach3 r JOIN edges3 e2 ON e2.src = r.node),
         |labels3 AS (SELECT node, min(lab) AS clus FROM reach3 GROUP BY node),
         |manifest AS (
         |  SELECT r.doc_id, r.quality, r.lang_pred,
         |    COALESCE(l.clus, r.doc_id) AS cluster,
         |    $nTokSql AS n_tok
         |  FROM rel r LEFT JOIN labels3 l ON l.node = r.doc_id)
         |SELECT doc_id, quality, lang_pred, cluster,
         |  CASE WHEN $splitHash % 100 < 90 THEN 'train'
         |       WHEN $splitHash % 100 < 95 THEN 'val'
         |       ELSE 'test' END AS split,
         |  n_tok
         |FROM manifest
         |ORDER BY doc_id""".stripMargin
  }

  /** The q145 training replay as CTE text: `lab` (labeled corpus) →
    * `xm` (hashed feature matrix) → `w0..wR` unrolled perceptron
    * rounds. Integer SUMs wrapped BIGINT (DuckDB SUM promotes to
    * HUGEINT).
    */
  private def perceptronCtes(dim: Int, rounds: Int): String = {
    val base =
      s"""lab AS (
         |  SELECT doc_id, text, CAST(1 AS BIGINT) AS y FROM documents
         |  UNION ALL
         |  SELECT doc_id + 9000000,
         |    repeat('the offer is free buy now click here ',
         |      CAST(3 + doc_id % 4 AS INT)) || 'ref ' || doc_id::VARCHAR,
         |    CAST(-1 AS BIGINT)
         |  FROM documents),
         |xt AS (SELECT doc_id, y,
         |    unnest(list_filter(string_split_regex(text, '\\s+'),
         |      t -> t <> '')) AS token
         |  FROM lab),
         |xm AS (SELECT doc_id, y,
         |    ${graft.text.TextClassify.bucketSql("token", dim)} AS bucket,
         |    CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM xt GROUP BY doc_id, y, bucket),
         |w0 AS (SELECT range AS bucket, CAST(0 AS BIGINT) AS weight
         |  FROM range($dim))""".stripMargin
    val steps = (1 to rounds).map { t =>
      s"""s$t AS (SELECT x.doc_id, x.y,
         |    CAST(SUM(x.cnt * COALESCE(w.weight, 0)) AS BIGINT) AS score
         |  FROM xm x LEFT JOIN w${t - 1} w ON w.bucket = x.bucket
         |  GROUP BY x.doc_id, x.y),
         |m$t AS (SELECT doc_id, y FROM s$t WHERE y * score <= 0),
         |d$t AS (SELECT x.bucket, CAST(SUM(m.y * x.cnt) AS BIGINT) AS d
         |  FROM xm x JOIN m$t m ON m.doc_id = x.doc_id
         |  GROUP BY x.bucket),
         |w$t AS (SELECT w.bucket, w.weight + COALESCE(d.d, 0) AS weight
         |  FROM w${t - 1} w LEFT JOIN d$t d ON d.bucket = w.bucket)""".stripMargin
    }.mkString(",\n")
    s"$base,\n$steps"
  }

  /** L2 rank key (|v|² row-constant term dropped) — q42's formulation. */
  private def distSql(v: String, cent: String): String =
    s"-2.0 * ${dotSql(v, cent)} + ${dotSql(cent, cent)}"
}
