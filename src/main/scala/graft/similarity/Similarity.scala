package graft.similarity

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`ArrayType(FloatType)`).
  *
  * The oracle-checked baseline is brute-force cosine top-k: embeddings are
  * cast to double and the dot product is a strict left fold
  * (`aggregate(zip_with(...))`) so the result is bit-identical to the
  * DuckDB `list_reduce` replay — no UDF, stays inside codegen.
  *
  * The scale path is [[signLshBuckets]]: random-hyperplane sign LSH where
  * the projection components are md5-derived plan-time CONSTANTS — fully
  * deterministic, no stored model, projected per-row with the codegen dot
  * product, zero shuffle. Candidates come from same-bucket joins instead
  * of the O(Q·N) cross join; recall is asserted against brute force in
  * the test suite. [[portableAnnTopK]] is the ±1-plane variant whose
  * whole pipeline (buckets, candidates, cosines, ranks) replays
  * bit-identically in the DuckDB oracle.
  */
object Similarity {

  /** Cast float embedding to double for deterministic arithmetic. */
  def asDouble(c: Column): Column = c.cast("array<double>")

  /** Strict left-fold dot product — order-deterministic. Codegen'd
    * native expression (higher-order `aggregate`/`zip_with` would fall
    * back to interpreted eval — ~50x slower on pair joins).
    */
  def dot(a: Column, b: Column): Column = VectorFunctions.dot(a, b)

  def norm2(a: Column): Column = dot(a, a)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(norm2(a) * norm2(b))

  /** Brute-force cosine top-k: for every query vector, the k nearest
    * corpus vectors. One broadcast of the (small) query side, no shuffle
    * of the corpus until the final per-query ranking.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    // norms are computed once per input row, BEFORE the pair join —
    // the join then does one fold per pair instead of three
    val q = queries.select(col(idCol).as("q_id"),
      asDouble(col(vecCol)).as("qe"))
      .withColumn("nq", norm2(col("qe")))
    val c = corpus.select(col(idCol).as("n_id"),
      asDouble(col(vecCol)).as("ce"))
      .withColumn("nc", norm2(col("ce")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("n_id").asc)
    c.crossJoin(broadcast(q))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("cosine",
        dot(col("qe"), col("ce")) / sqrt(col("nq") * col("nc")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("cosine"), col("rank"))
  }

  /** All pairs (a < b) with cosine >= threshold — embedding near-dup
    * detection, exact baseline.
    */
  def cosinePairs(corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val x = corpus.select(col(idCol).as("a"), asDouble(col(vecCol)).as("xe"))
      .withColumn("nx", norm2(col("xe")))
    val y = corpus.select(col(idCol).as("b"), asDouble(col(vecCol)).as("ye"))
      .withColumn("ny", norm2(col("ye")))
    x.join(y, col("a") < col("b"))
      .withColumn("cosine",
        dot(col("xe"), col("ye")) / sqrt(col("nx") * col("ny")))
      .filter(col("cosine") >= threshold)
      .select(col("a"), col("b"), col("cosine"))
  }

  /** Int8-range symmetric quantization of `vecCol`: q_i = round(127 *
    * x_i / max|x|) as `array<int>`, plus the precomputed integer
    * self-dot `normCol`. Zero vectors (max|x| = 0) cannot be quantized
    * and are dropped. Per-vector cost — the higher-order `transform`
    * lambdas here are CodegenFallback, which is fine OFF the per-pair
    * hot path (the pair kernel is the codegen [[IntDotProduct]]).
    */
  private def quantize(df: DataFrame, idCol: String, vecCol: String,
      idAs: String, vecAs: String, normAs: String): DataFrame =
    df.select(col(idCol).as(idAs),
        VectorFunctions.quantInt8Col(asDouble(col(vecCol))).as(vecAs))
      .filter(col(vecAs).isNotNull)
      .withColumn(normAs,
        VectorFunctions.dotInt(col(vecAs), col(vecAs)))

  /** Quantized brute-force cosine top-k — the memory-bandwidth scale
    * path: int8-range vectors store 8x less than float64 and the
    * per-pair kernel is one integer multiply-add loop in whole-stage
    * codegen. Integer dots are EXACT, so quantized scores (and their
    * ranking) replay bit-identically in the DuckDB oracle (q66) — the
    * determinism md5 buys for hashes, quantization buys for vector
    * math. Quantization error costs only ranking QUALITY, measured
    * against the exact ranking in SimilaritySpec.
    */
  def quantizedTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = quantize(queries, idCol, vecCol, "q_id", "qq", "nq")
    val c = quantize(corpus, idCol, vecCol, "n_id", "cq", "nc")
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("qcos").desc, col("n_id").asc)
    c.crossJoin(broadcast(q))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("qcos",
        VectorFunctions.dotInt(col("qq"), col("cq")).cast("double") /
          sqrt((col("nq") * col("nc")).cast("double")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("qcos"), col("rank"))
  }

  /** Deterministic hyperplane components: plane `p`, dimension `i` is
    * derived from md5Low60("plane:p:i"). `signsOnly=true` gives Rademacher
    * ±1 components (portable to SQL as literal lists — the oracle-checked
    * ANN path); `false` gives dense components in [-0.5, 0.5).
    *
    * The components depend only on (p, i) — they are CONSTANTS. Deriving
    * them once at plan time and projecting with the codegen [[dot]]
    * replaces the earlier per-row per-element hash folds (interpreted
    * higher-order eval) with one primitive loop per plane.
    */
  def hyperplanes(bits: Int, dims: Int, signsOnly: Boolean): Seq[Array[Double]] =
    (0 until bits).map { p =>
      Array.tabulate(dims) { i =>
        val h = graft.functions.TextHash.md5Low60(s"plane:$p:$i")
        if (signsOnly) if ((h & 1L) == 1L) 1.0 else -1.0
        else (h % 1000000L).toDouble / 2000000.0 - 0.25
      }
    }

  /** Bucket id from sign bits of the projections onto `planes`. Strict
    * `> 0` — matching the SQL replay's CASE WHEN. A vector whose length
    * differs from the plane width projects to NULL -> bit 0 (bucketed,
    * never dropped).
    */
  def planeBucket(e: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (plane, p) =>
      val proj = dot(e, array(plane.toSeq.map(lit): _*))
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Sign-LSH bucket id per vector: `bits` deterministic hyperplanes
    * (dense md5-derived components), projections via the codegen dot
    * product. Vectors in the same bucket are ANN candidates.
    */
  def signLshBuckets(df: DataFrame, idCol: String, vecCol: String,
      bits: Int = 12, dims: Int = 64): DataFrame =
    df.select(col(idCol), col(vecCol),
      planeBucket(asDouble(col(vecCol)), hyperplanes(bits, dims, signsOnly = false))
        .as("bucket"))

  /** LSH-accelerated near-dup pairs: exact cosine evaluated ONLY on
    * same-bucket (a < b) candidates — the scale path for embedding
    * dedup, linear in corpus + candidates instead of O(n^2). At the
    * 0.99-near-identical threshold, sign-LSH recall is effectively 1:
    * near-identical vectors agree on every hyperplane sign.
    */
  def lshCosinePairs(corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bits: Int = 12): DataFrame = {
    val b = signLshBuckets(corpus, idCol, vecCol, bits)
    val x = b.select(col(idCol).as("a"), asDouble(col(vecCol)).as("xe"),
      col("bucket"))
      .withColumn("nx", norm2(col("xe")))
    val y = b.select(col(idCol).as("b"), asDouble(col(vecCol)).as("ye"),
      col("bucket"))
      .withColumn("ny", norm2(col("ye")))
    x.join(y, Seq("bucket")).filter(col("a") < col("b"))
      .withColumn("cosine",
        dot(col("xe"), col("ye")) / sqrt(col("nx") * col("ny")))
      .filter(col("cosine") >= threshold)
      .select(col("a"), col("b"), col("cosine")).distinct()
  }

  /** LSH-accelerated top-k: rank only same-bucket candidates. Trades
    * recall for a candidate set ~N/2^bits per query; multi-probe = union
    * several bit-flipped buckets (left at 1 probe here; the recall/cost
    * point is asserted in tests).
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, bits: Int = 8): DataFrame =
    bucketedTopK(signLshBuckets(queries, idCol, vecCol, bits),
      signLshBuckets(corpus, idCol, vecCol, bits), idCol, vecCol, k)

  /** Oracle-portable ANN: Rademacher (±1) hyperplanes with md5-derived
    * signs, so the bucket assignment, candidate set, exact cosine AND
    * rank are all bit-reproducible in the DuckDB replay (the ±1 lists
    * embed as SQL literals; every float op is a strict left fold). Same
    * scale shape as [[lshTopK]] — a bucket equi-join instead of the
    * O(Q·N) cross product.
    */
  def portableAnnTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, bits: Int = 8, dims: Int = 64): DataFrame = {
    val planes = hyperplanes(bits, dims, signsOnly = true)
    def withB(df: DataFrame) = df.select(col(idCol), col(vecCol),
      planeBucket(asDouble(col(vecCol)), planes).as("bucket"))
    bucketedTopK(withB(queries), withB(corpus), idCol, vecCol, k)
  }

  /** Int8-range quantization of `vecCol` keeping BOTH views: `qi`
    * (`array<int>`, for exact integer sums) and `qd` (`array<double>`,
    * for strict-fold distance math) alongside the original column.
    * Same arithmetic as [[quantize]]: q = round(x * 127 / max|x|), zero
    * vectors dropped. Shared by the oracle-portable IVF path — every op
    * here (abs/max/multiply/divide/round at scale 0) is bit-identical
    * across engines.
    */
  private[similarity] def withQuantizedDouble(df: DataFrame, idCol: String,
      vecCol: String): DataFrame =
    df.select(col(idCol), col(vecCol),
        VectorFunctions.quantInt8Col(asDouble(col(vecCol))).as("qi"))
      .filter(col("qi").isNotNull)
      .withColumn("qd", col("qi").cast("array<double>"))

  /** Oracle-PORTABLE IVF coarse quantizer: Lloyd k-means over the int8-
    * QUANTIZED vectors, with centroid updates computed as exact integer
    * sums divided in double — so unlike [[ivfCentroids]]' float `avg`
    * (whose low bits depend on engine summation order), every training
    * step is bit-reproducible in any IEEE engine:
    *
    *   - init: the `c` vectors with the smallest (md5(id), id) — no RNG;
    *   - assignment: argmin over `-2·(q·cent) + |cent|²`, all strict
    *     left folds, ties broken by cluster index;
    *   - update: per-dimension Σ int / count — the sum is exact (order-
    *     independent) and int64→double + one division are correctly
    *     rounded in every IEEE engine.
    *
    * The DuckDB oracle (q42) replays the WHOLE training relationally —
    * centroids are a c-row CTE per iteration, not engine state.
    */
  def ivfCentroidsPortable(corpus: DataFrame, idCol: String, vecCol: String,
      c: Int, iters: Int = 2): Array[Array[Double]] = {
    val ds = withQuantizedDouble(corpus, idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try trainPortable(ds, idCol, c, iters)
    finally ds.unpersist(blocking = false)
  }

  /** Per-vector coarse bucket under the PORTABLE quantizer:
    * `(idCol, bucket)` for every non-zero vector — the assignment
    * relation cluster-level reporting (labeling, per-cluster stats)
    * consumes. Same training + argmin as [[ivfTopKPortable]]'s index;
    * exact argmin, no probes.
    */
  def ivfAssignments(corpus: DataFrame, idCol: String, vecCol: String,
      c: Int = 16, iters: Int = 2): DataFrame = {
    val ds = withQuantizedDouble(corpus, idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val cents = trainPortable(ds, idCol, c, iters)
      ds.select(col(idCol), nearestCentroid(col("qd"), cents).as("bucket"))
        .localCheckpoint()
    } finally ds.unpersist(blocking = false)
  }

  /** Deterministic driver-side grouping of a centroid matrix into ~√c
    * super-clusters: 3 local Lloyd rounds over the c centroid points
    * themselves (spread init by index — no RNG), empty groups dropped.
    * Pure Scala on c×dims doubles — microseconds next to any data pass.
    */
  private def centroidGroups(cents: Array[Array[Double]])
      : (Array[Array[Double]], Array[Array[Array[Double]]], Array[Array[Int]]) = {
    val c = cents.length
    val g = math.max(1, math.ceil(math.sqrt(c.toDouble)).toInt)
    val dims = cents.head.length
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var j = 0
      while (j < dims) { val t = a(j) - b(j); acc += t * t; j += 1 }
      acc
    }
    var supers = Array.tabulate(g)(i => cents((i.toLong * c / g).toInt))
    val assign = Array.fill(c)(0)
    var it = 0
    while (it < 3) {
      var i = 0
      while (i < c) {
        var best = 0; var bd = d2(cents(i), supers(0))
        var s = 1
        while (s < supers.length) {
          val dd = d2(cents(i), supers(s))
          if (dd < bd) { bd = dd; best = s }
          s += 1
        }
        assign(i) = best
        i += 1
      }
      supers = Array.tabulate(supers.length) { s =>
        val members = (0 until c).filter(assign(_) == s)
        if (members.isEmpty) supers(s)
        else {
          val m = new Array[Double](dims)
          members.foreach { i =>
            var j = 0; while (j < dims) { m(j) += cents(i)(j); j += 1 }
          }
          m.map(_ / members.length)
        }
      }
      it += 1
    }
    val grouped = supers.indices
      .map(s => s -> (0 until c).filter(assign(_) == s).toArray)
      .filter(_._2.nonEmpty)
    (grouped.map(x => supers(x._1)).toArray,
      grouped.map(_._2.map(cents(_))).toArray,
      grouped.map(_._2).toArray)
  }

  /** Two-level centroid assignment (global index) — the SCALE-ONLY
    * alternative to [[nearestCentroid]] once c ≈ √N makes the flat
    * c·dims scan the dominant cost: ~2√c·dims per row instead.
    * Approximate near super-boundaries; identical-after-quantization
    * vectors still co-assign, so dedup output is unchanged
    * (SemanticDedupSpec asserts exact == hierarchical end-to-end).
    * Oracle-checked paths keep the exact argmin.
    */
  def hierarchicalAssign(e: Column, cents: Array[Array[Double]]): Column = {
    val (s, ch, gi) = centroidGroups(cents)
    graft.functions.CentroidOps.nearestHierCol(e, s, ch, gi)
  }

  /** Hierarchical multi-probe: the `nProbe` best children across the
    * `nProbe` nearest supers — [[hierarchicalAssign]]'s ~2√c·dims scan
    * composed with multi-probe pair generation (still approximate near
    * super-boundaries; candidates scale with nProbe·c/√c, not c).
    */
  def hierarchicalAssignN(e: Column, cents: Array[Array[Double]],
      nProbe: Int): Column = {
    val (s, ch, gi) = centroidGroups(cents)
    graft.functions.CentroidOps.nearestHierNCol(e, s, ch, gi, nProbe)
  }

  /** Lloyd training over an already-quantized relation. Training reads
    * the corpus `iters + 1` times (init sample + one assignment pass per
    * iteration), so callers persist `ds` around the loop — quantizing
    * once instead of once per consumer. `assign` swaps the per-
    * iteration assignment expression (exact argmin by default; the
    * hierarchical two-level scan for large c).
    */
  private[similarity] def trainPortable(ds: DataFrame, idCol: String,
      c: Int, iters: Int,
      assign: (Column, Array[Array[Double]]) => Column = nearestCentroid)
      : Array[Array[Double]] = {
    var cents: Array[Array[Double]] = ds
      .select(col(idCol), col("qd"),
        graft.functions.PortableHash
          .hash60Base(col(idCol).cast("string")).as("h"))
      .orderBy(col("h"), col(idCol)).limit(c)
      .select(col("qd")).collect().map(_.getSeq[Double](0).toArray)
    var it = 0
    while (it < iters) {
      val dims = cents.head.length
      val means = ds
        .withColumn("cluster", assign(col("qd"), cents))
        .select(col("cluster"), posexplode(col("qi")).as(Seq("pos", "v")))
        .groupBy(col("cluster"), col("pos"))
        .agg((sum(col("v")).cast("double") / count(lit(1)).cast("double"))
          .as("m"))
        .groupBy(col("cluster"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("ms"))
        .select(col("cluster"), col("ms.m").as("centroid"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
      // empty clusters keep their previous centroid
      cents = Array.tabulate(cents.length)(i =>
        means.getOrElse(i, cents(i)).ensuring(_.length == dims))
      it += 1
    }
    cents
  }

  /** IVF top-k with the PORTABLE quantizer: buckets/probes are computed
    * from the quantized view, the final re-rank is the exact cosine on
    * the ORIGINAL embeddings — every stage hash-checks against the
    * DuckDB replay (q42), the first ANN index whose TRAINING is part of
    * the verified contract rather than trusted engine state.
    */
  def ivfTopKPortable(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, c: Int = 16, nProbe: Int = 4,
      iters: Int = 2): DataFrame = {
    // One quantize pass total: training reads the cached relation
    // iters+1 times and the corpus-side bucket assignment reads it once
    // more. The cache is NOT unpersisted — the returned DataFrame is
    // lazy and re-evaluates cb on every action (same caller-managed
    // eviction contract as minhashNearDuplicates' shingle cache).
    val ds = withQuantizedDouble(corpus, idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cents = trainPortable(ds, idCol, c, iters)
    val cb = ds
      .select(col(idCol), col(vecCol),
        nearestCentroid(col("qd"), cents).as("bucket"))
    val qb = withQuantizedDouble(queries, idCol, vecCol)
      .select(col(idCol), col(vecCol),
        explode(nearestCentroids(col("qd"), cents, nProbe)).as("bucket"))
    bucketedTopK(qb, cb, idCol, vecCol, k)
  }

  /** SemDeDup-style semantic deduplication: the cluster-bucketed SCALE
    * path for embedding near-dup removal. [[cosinePairs]] (q23) is the
    * exact all-pairs baseline — O(N²) dots, a non-starter past ~10⁶
    * vectors. Here the corpus is first coarse-clustered with the
    * oracle-portable IVF quantizer ([[ivfCentroidsPortable]] — int8
    * Lloyd, md5-seeded init, exact-integer centroid updates), and the
    * quadratic cosine stage runs only WITHIN each cluster: linear in the
    * corpus plus Σ|cluster|² pair work, every stage a keyed join/groupBy
    * AQE can skew-split. Near-duplicate embeddings co-cluster by
    * construction — identical vectors share a quantized view, and range
    * quantization is scale-invariant, so scaled copies (which cosine
    * treats as exact duplicates) share one too.
    *
    * Within-bucket pairs at cosine >= `threshold` (exact arithmetic on
    * the ORIGINAL embeddings) are resolved to clusters by
    * [[graft.dedup.Dedup.connectedComponents]] — transitive chains
    * collapse to one survivor even when the endpoints were never
    * compared — and the minimum id per component survives.
    *
    * Every stage (training, bucket assignment, pair cosines, component
    * labels) replays bit-identically in the DuckDB oracle (q95).
    *
    * @param hierarchical swap every assignment (training AND bucketing)
    *   to the two-level [[hierarchicalAssign]] scan — ~2√c·dims per row
    *   instead of c·dims, the path for c ≈ √N centroid counts. Scale-
    *   only (the oracle keeps the exact argmin); dedup output is
    *   IDENTICAL because duplicates share a quantized view and
    *   co-assign under any deterministic rule.
    * @param nProbe bucket assignments PER VECTOR for the pair stage
    *   (the output `bucket` stays the single nearest). Single-probe
    *   SemDeDup misses near-boundary duplicate pairs by construction —
    *   two almost-identical vectors straddling a cluster boundary are
    *   never compared; with nProbe >= 2 each vector enters its nProbe
    *   nearest buckets, so boundary pairs meet in the second-choice
    *   bucket. Pair work scales by <= nProbe (each pair deduplicated
    *   before CC). Composes with `hierarchical` via
    *   [[hierarchicalAssignN]] (nProbe supers probed, nProbe best
    *   children across them) — the c ≈ √N configuration.
    * @return one row per corpus vector: (idCol, bucket, cluster, kept)
    *   where cluster is the minimum reachable id (self for singletons)
    *   and kept marks the survivor. Like [[ivfTopKPortable]], the
    *   quantized relation stays cached for the lazy result's lifetime
    *   (caller-managed eviction).
    */
  /** Cluster-balanced DIVERSITY selection — the coverage complement of
    * [[semanticDedup]]: where dedup drops redundant near-twins,
    * diversity sampling keeps a bounded, representative slice of EVERY
    * region of embedding space (the "cluster-then-pick-representatives"
    * curation step production pipelines run to cap over-represented
    * modes without losing coverage of rare ones).
    *
    * Train the portable coarse quantizer (q42's verified Lloyd), assign
    * every vector to its cluster, score each member's CENTRALITY (exact
    * double cosine to its own centroid — the strict-fold [[dot]], so the
    * DuckDB oracle replays it bit-exactly), and keep the `perCluster`
    * most central members per cluster (ties by id).
    *
    * Scale shape: one training pass (iters+1 scans + skinny shuffles),
    * one assignment scan against the O(1)-plan-size centroid matrix,
    * one broadcast join against the c-row centroid relation, and
    * per-cluster windows bounded at ~N/c rows — with the documented
    * c ∝ N dial, per-window populations stay flat as the corpus grows.
    */
  def diversitySample(corpus: DataFrame, idCol: String, vecCol: String,
      perCluster: Int, c: Int = 16, iters: Int = 2): DataFrame = {
    require(perCluster > 0, "perCluster must be positive")
    val spark = corpus.sparkSession
    val ds = withQuantizedDouble(corpus, idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cents = trainPortable(ds, idCol, c, iters)
    import spark.implicits._
    val centsDf = cents.zipWithIndex
      .map { case (v, i) => (i, v.toSeq) }.toSeq.toDF("bucket", "cent")
    val scored = ds
      .select(col(idCol), asDouble(col(vecCol)).as("e"),
        nearestCentroid(col("qd"), cents).as("bucket"))
      .join(broadcast(centsDf), Seq("bucket"))
      .withColumn("centrality",
        dot(col("e"), col("cent"))
          / sqrt(norm2(col("e")) * norm2(col("cent"))))
    val w = Window.partitionBy(col("bucket"))
      .orderBy(col("centrality").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= perCluster)
      .select(col(idCol), col("bucket"), col("centrality"), col("rank"))
  }

  def semanticDedup(corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, c: Int = 16, iters: Int = 2,
      hierarchical: Boolean = false, nProbe: Int = 1): DataFrame = {
    val assign: (Column, Array[Array[Double]]) => Column =
      if (hierarchical) hierarchicalAssign else nearestCentroid
    val assignN: (Column, Array[Array[Double]]) => Column =
      if (hierarchical) (e, cs) => hierarchicalAssignN(e, cs, nProbe)
      else (e, cs) => nearestCentroids(e, cs, nProbe)
    val ds = withQuantizedDouble(corpus, idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cents = trainPortable(ds, idCol, c, iters, assign)
    val cb = ds
      .select(col(idCol), asDouble(col(vecCol)).as("e"),
        assign(col("qd"), cents).as("bucket"))
      .withColumn("nrm", norm2(col("e")))
    // pair stage reads the nProbe-expanded assignment; output buckets
    // stay primary
    val pb =
      if (nProbe <= 1) cb
      else {
        val probes = ds
          .select(col(idCol), asDouble(col(vecCol)).as("e"),
            explode(assignN(col("qd"), cents)).as("bucket"))
          .withColumn("nrm", norm2(col("e")))
        // exact top-n always contains the primary bucket (element 0);
        // the hierarchical top-n need NOT (its best-n children can all
        // come from another super), so union the primary assignment in
        // — multi-probe must only ever ADD pairs
        if (hierarchical) probes.unionByName(cb) else probes
      }
    val x = pb.select(col("bucket"), col(idCol).as("a"),
      col("e").as("xe"), col("nrm").as("nx"))
    val y = pb.select(col("bucket"), col(idCol).as("b"),
      col("e").as("ye"), col("nrm").as("ny"))
    val rawPairs = x.join(y, Seq("bucket"))
      .filter(col("a") < col("b"))
      .filter(dot(col("xe"), col("ye")) / sqrt(col("nx") * col("ny"))
        >= threshold)
      .select(col("a"), col("b"))
    // a boundary pair can meet in up to nProbe shared buckets
    val pairs = if (nProbe <= 1) rawPairs else rawPairs.distinct()
    val cc = graft.dedup.Dedup.connectedComponents(pairs)
      .withColumnRenamed("doc_id", idCol)
    cb.select(col(idCol), col("bucket"))
      .join(cc, Seq(idCol), "left")
      .select(col(idCol), col("bucket"),
        coalesce(col("cluster"), col(idCol)).as("cluster"))
      .withColumn("kept", col("cluster") === col(idCol))
  }

  /** Cross-corpus SEMANTIC contamination matches — the embedding-space
    * member of the train-vs-eval matcher family (text near-dup
    * [[graft.dedup.Dedup.crossCorpusMatches]], span provenance
    * [[graft.text.Winnow.crossMatches]], image/audio
    * [[graft.multimodal.Perceptual.crossMatches]]): eval items whose
    * EMBEDDINGS near-duplicate a train item — the paraphrase-level leak
    * the lexical matchers cannot see (a reworded benchmark answer
    * shares no shingles but keeps its embedding).
    *
    * Deployment posture: the portable Lloyd quantizer (q42's verified
    * training) trains on the TRAIN side only — the train index exists,
    * eval probes it. Train vectors take their single nearest bucket;
    * each eval vector probes its `nProbe` nearest buckets (the IVF
    * query pattern: a cross pair is found iff train's bucket is among
    * eval's probes, so probing widens recall at eval-side cost only —
    * the [[semanticDedup]] nProbe boundary argument, one-sided).
    * Candidates join ACROSS corpora only — never within either (id
    * spaces may overlap) — then the exact strict-left-fold double
    * cosine verifies, so the DuckDB oracle replays bit-identically.
    *
    * Scale shape: training + one assignment scan over train, an
    * nProbe-exploded assignment of the (typically tiny) eval side whose
    * bucket relation broadcasts, candidate work bounded by bucket
    * populations — never all-pairs. A (train, eval) pair appears at
    * most once: train holds one bucket and eval's probes are distinct.
    *
    * @return (train_id, eval_id, cosine), one row per verified match.
    */
  def crossCorpusSemanticMatches(train: DataFrame, trainId: String,
      eval: DataFrame, evalId: String, vecCol: String,
      threshold: Double, c: Int = 16, iters: Int = 2,
      nProbe: Int = 2): DataFrame = {
    val tds = withQuantizedDouble(train, trainId, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cents = trainPortable(tds, trainId, c, iters)
    val tb = tds
      .select(col(trainId).as("train_id"), asDouble(col(vecCol)).as("xe"),
        nearestCentroid(col("qd"), cents).as("bucket"))
      .withColumn("nx", norm2(col("xe")))
    val eb = withQuantizedDouble(eval, evalId, vecCol)
      .select(col(evalId).as("eval_id"), asDouble(col(vecCol)).as("ye"),
        explode(nearestCentroids(col("qd"), cents, nProbe)).as("bucket"))
      .withColumn("ny", norm2(col("ye")))
    tb.join(eb, Seq("bucket"))
      .withColumn("cosine",
        dot(col("xe"), col("ye")) / sqrt(col("nx") * col("ny")))
      .filter(col("cosine") >= threshold)
      .select(col("train_id"), col("eval_id"), col("cosine"))
  }

  /** Drop every train doc semantically matched by `eval`
    * ([[crossCorpusSemanticMatches]] at `threshold`): one anti-join on
    * the matched train-id set — the embedding-space sibling of
    * [[graft.dedup.Dedup.decontaminateNearDup]].
    */
  def decontaminateSemantic(train: DataFrame, trainId: String,
      eval: DataFrame, evalId: String, vecCol: String,
      threshold: Double, c: Int = 16, iters: Int = 2,
      nProbe: Int = 2): DataFrame = {
    val hit = crossCorpusSemanticMatches(train, trainId, eval, evalId,
        vecCol, threshold, c, iters, nProbe)
      .select(col("train_id").as("__sem_hit")).distinct()
    train.join(hit, train(trainId) === col("__sem_hit"), "left_anti")
  }

  /** IVF-PQ: coarse inverted-file routing plus product-quantization
    * scoring — the memory-compressed ANN layout a 100 TB corpus needs:
    * each indexed vector stores only its coarse bucket + `m` one-byte
    * codes (vs dims×4 bytes of floats), and query scoring reads codes,
    * never the original vectors.
    *
    *   - coarse quantizer: the portable Lloyd loop
    *     ([[ivfCentroidsPortable]]'s md5-seeded init + `coarseIters`
    *     exact-integer-mean rounds, the q42-verified training) — the
    *     same trained routing the plain IVF index uses;
    *   - PQ codebooks: initialized from the first `kCodes` vectors of
    *     the same ordering sliced into `m` subspaces, then refined with
    *     `pqIters` rounds of per-subspace Lloyd over the whole corpus —
    *     codeword components are shifted round-half-up integer means,
    *     so they stay exact int8 quantities and the ADC dots remain
    *     exact int64. `kCodes` is independent of `c`: reconstruction
    *     quality needs far more codewords (256 is the classical choice)
    *     than coarse routing needs cells;
    *   - encode: per subspace, the code is the argmin codeword by L2
    *     (ties → lower code), via the O(1)-plan-size [[graft.functions
    *     .CentroidOps]] argmin on the sliced quantized vector;
    *   - score (ADC): the quantized cosine
    *     Σ_j IntDot(q_j, cw_j[code_j]) / √(|q|²·|reconstruction|²) —
    *     numerator and both norms are EXACT int64 inner products between
    *     the int8-quantized query and the reconstructed codewords, and
    *     the one division + sqrt are correctly-rounded IEEE ops, so
    *     scores and ranks replay bit-identically in the DuckDB oracle
    *     (q92): the q66 exact-integer trick applied to a compressed
    *     index. (Range quantization is scale-invariant, so the
    *     normalized score approximates COSINE; the raw inner product
    *     would carry a per-vector 1/max|x| distortion.)
    *
    * Candidates are the members of the `nProbe` clusters nearest each
    * query — linear in corpus + candidates, no all-pairs stage.
    */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, c: Int = 16, m: Int = 8,
      nProbe: Int = 4, kCodes: Int = 256, pqIters: Int = 2,
      coarseIters: Int = 2): DataFrame = {
    // one quantize pass (same persist contract as ivfTopKPortable)
    val ds = withQuantizedDouble(corpus, idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val idx = IvfPqIndex.buildFromQuantized(ds, idCol, c, m, kCodes,
      pqIters, coarseIters)
    idx.topK(queries, idx.encodeQuantized(ds, idCol), idCol, vecCol,
      k, nProbe)
  }

  /** [[ivfPqTopK]] with an exact re-rank tail: ADC selects `refineR`
    * candidates per query, the exact double cosine re-scores them from
    * the original embeddings (see [[IvfPqIndex.topKRefined]]).
    */
  def ivfPqTopKRefined(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, c: Int = 16, m: Int = 8,
      nProbe: Int = 4, kCodes: Int = 256, refineR: Int = 100,
      pqIters: Int = 2, coarseIters: Int = 2): DataFrame = {
    val ds = withQuantizedDouble(corpus, idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val idx = IvfPqIndex.buildFromQuantized(ds, idCol, c, m, kCodes,
      pqIters, coarseIters)
    idx.topKRefined(queries, idx.encodeQuantized(ds, idCol), corpus,
      idCol, vecCol, k, nProbe, refineR)
  }

  /** A trained IVF-PQ index: coarse centroid matrix + per-subspace
    * codebooks. Like [[IvfIndex]] it is tiny, serializable and
    * persistable, but the relation [[encode]] produces is the real
    * artifact: ONE row per corpus vector holding only its coarse bucket
    * and `m` small integer codes — write THAT to a table and
    * [[topK]] answers queries from it without ever touching the
    * original embedding column (the 100 TB deployment shape: the
    * float corpus stays cold, queries scan the compressed index).
    */
  final case class IvfPqIndex(coarse: Array[Array[Double]],
      codebooks: Array[Array[Array[Int]]]) {

    def m: Int = codebooks.length
    def subDim: Int = codebooks.head.head.length

    private def codebooksD: Array[Array[Array[Double]]] =
      codebooks.map(_.map(_.map(_.toDouble)))

    /** Compress `corpus`: (id, bucket, code_0..code_{m-1}). */
    def encode(corpus: DataFrame, idCol: String, vecCol: String): DataFrame =
      encodeQuantized(withQuantizedDouble(corpus, idCol, vecCol), idCol)

    private[similarity] def encodeQuantized(ds: DataFrame,
        idCol: String): DataFrame = {
      val cbD = codebooksD
      val codeCols = (0 until m).map(j =>
        nearestCentroid(slice(col("qd"), j * subDim + 1, subDim), cbD(j))
          .as(s"code_$j"))
      ds.select(Seq(col(idCol),
        nearestCentroid(col("qd"), coarse).as("bucket")) ++ codeCols: _*)
    }

    /** ANN top-k over an [[encode]]d relation. Scores are the quantized
      * cosine Σ_j IntDot(q_j, cw_j[code_j]) / √(|q|²·|reconstruction|²)
      * — exact int64 dots, one division + sqrt (bit-portable, q92).
      */
    def topK(queries: DataFrame, encoded: DataFrame, idCol: String,
        vecCol: String, k: Int, nProbe: Int): DataFrame = {
      val qs = withQuantizedDouble(queries, idCol, vecCol)
        .select(col(idCol).as("q_id"), col("qi"),
          VectorFunctions.dotInt(col("qi"), col("qi")).as("nq"),
          explode(nearestCentroids(col("qd"), coarse, nProbe)).as("bucket"))
      // codebooks as int literals: codeword values are int8 quantities,
      // so the ADC partials and both norms are exact integer dots
      val cbLits: Seq[Seq[Seq[Int]]] =
        codebooks.toSeq.map(_.toSeq.map(_.toSeq))
      def codeword(j: Int) =
        element_at(typedLit(cbLits(j)), col(s"code_$j") + 1)
      val scoreCols = (0 until m).map(j =>
        VectorFunctions.dotInt(slice(col("qi"), j * subDim + 1, subDim),
          codeword(j)))
      val ncCols = (0 until m).map(j =>
        VectorFunctions.dotInt(codeword(j), codeword(j)))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("qcos").desc, col("n_id").asc)
      qs.join(encoded.withColumnRenamed(idCol, "n_id"), Seq("bucket"))
        .filter(col("n_id") =!= col("q_id"))
        .withColumn("qcos",
          scoreCols.reduce(_ + _).cast("double") /
            sqrt((col("nq") * ncCols.reduce(_ + _)).cast("double")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("q_id"), col("n_id"), col("qcos"), col("rank"))
    }

    /** ADC-select-then-exact-re-rank: the compressed index picks the
      * `refineR` strongest candidates per query (one [[topK]] pass —
      * codes only, the float corpus stays cold), then ONLY those
      * Q×R candidate rows fetch their original embeddings and are
      * re-scored with the exact double cosine (strict-left-fold
      * [[dot]], the q22 kernel) — so the final ranking carries no PQ
      * reconstruction error, only coarse-routing loss. The re-score
      * join is keyed on the candidate id: a shuffle join over
      * candidates, never a corpus scan. Exact arithmetic end-to-end →
      * replays bit-identically in the DuckDB oracle (q136 = q92's
      * CTEs + one re-score CTE).
      */
    def topKRefined(queries: DataFrame, encoded: DataFrame,
        corpus: DataFrame, idCol: String, vecCol: String, k: Int,
        nProbe: Int, refineR: Int): DataFrame = {
      val cands = topK(queries, encoded, idCol, vecCol, refineR, nProbe)
        .select(col("q_id"), col("n_id"))
      val q = queries.select(col(idCol).as("q_id"),
          asDouble(col(vecCol)).as("qe"))
        .withColumn("nq2", norm2(col("qe")))
      val nb = corpus.select(col(idCol).as("n_id"),
          asDouble(col(vecCol)).as("ne"))
        .withColumn("nn2", norm2(col("ne")))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("cosine").desc, col("n_id").asc)
      cands.join(broadcast(q), Seq("q_id"))
        .join(nb, Seq("n_id"))
        .withColumn("cosine",
          dot(col("qe"), col("ne")) / sqrt(col("nq2") * col("nn2")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("q_id"), col("n_id"), col("cosine"), col("rank"))
    }

    /** Flatten to a persistable relation: `("coarse", i, 0, vec)` rows
      * for the centroid matrix, `("code", code, j, vec)` rows per
      * subspace codeword (int codewords carried as exact doubles).
      */
    def toDF(spark: org.apache.spark.sql.SparkSession): DataFrame = {
      import spark.implicits._
      val rows =
        coarse.zipWithIndex.toSeq.map { case (v, i) =>
          ("coarse", i, 0, v.toSeq) } ++
        (for (j <- 0 until m; code <- codebooks(j).indices)
          yield ("code", code, j, codebooks(j)(code).map(_.toDouble).toSeq))
      rows.toDF("kind", "i", "j", "vec")
    }
  }

  object IvfPqIndex {

    def build(corpus: DataFrame, idCol: String, vecCol: String,
        c: Int = 16, m: Int = 8, kCodes: Int = 256,
        pqIters: Int = 2, coarseIters: Int = 2): IvfPqIndex = {
      // training makes ~2(pqIters + coarseIters) passes over the
      // quantized relation; quantize once (ivfPqTopK's contract) and
      // release after the build fully materializes into plain arrays
      val ds = withQuantizedDouble(corpus, idCol, vecCol)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try buildFromQuantized(ds, idCol, c, m, kCodes, pqIters, coarseIters)
      finally ds.unpersist(false)
    }

    private[similarity] def buildFromQuantized(ds: DataFrame, idCol: String,
        c: Int, m: Int, kCodes: Int, pqIters: Int = 2,
        coarseIters: Int = 2): IvfPqIndex = {
      // prune to the 3 sample columns BEFORE the TakeOrdered: the
      // quantized relation carries the original vector and both
      // quantized views, and dragging 4 arrays per row through the
      // sample sort dominated the whole build at scale
      val bigSample: Array[Array[Double]] = ds
        .select(col(idCol), col("qd"),
          graft.functions.PortableHash
            .hash60Base(col(idCol).cast("string")).as("h"))
        .orderBy(col("h"), col(idCol)).limit(math.max(c, kCodes))
        .select(col("qd")).collect().map(_.getSeq[Double](0).toArray)
      val dims = bigSample.head.length
      require(dims % m == 0, s"dims $dims not divisible into $m subspaces")
      val sub = dims / m
      // Init: the first kCodes sample subvectors, then `pqIters` rounds
      // of per-subspace Lloyd over the WHOLE corpus — all m subspaces
      // refined in ONE aggregation pass per round (explode m
      // (j, code, subvector) structs per row, sum per component).
      // Codeword components stay EXACT int8 quantities — the updated
      // component is the shifted round-half-up integer mean
      // floor(mean + 0.5) = ((2*(s + 127n) + n) div (2n)) - 127, all
      // terms nonnegative (int8 values are >= -127) so truncating and
      // floor division agree and the DuckDB replay (q92) is `//` on
      // BIGINTs — the exact-integer ADC contract survives training.
      var books: Array[Array[Array[Int]]] =
        Array.tabulate(m)(j => bigSample.take(kCodes)
          .map(_.slice(j * sub, (j + 1) * sub).map(_.toInt)))
      var it = 0
      while (it < pqIters) {
        val booksD = books.map(_.map(_.map(_.toDouble)))
        val perJ = (0 until m).map(j =>
          struct(lit(j).as("j"),
            nearestCentroid(slice(col("qd"), j * sub + 1, sub), booksD(j))
              .as("code"),
            slice(col("qi"), j * sub + 1, sub).as("v")))
        val sums = ds
          .select(explode(array(perJ: _*)).as("s"))
          .select(col("s.j"), col("s.code"),
            posexplode(col("s.v")).as(Seq("pos", "x")))
          .groupBy(col("j"), col("code"), col("pos"))
          .agg(sum(col("x")).cast("long").as("s"), count(lit(1)).as("n"))
          .collect()
          .map(r => ((r.getInt(0), r.getInt(1), r.getInt(2)),
            (r.getLong(3), r.getLong(4))))
          .toMap
        books = Array.tabulate(m)(j => Array.tabulate(books(j).length)(code =>
          Array.tabulate(sub) { pos =>
            sums.get((j, code, pos)) match {
              case Some((s, n)) =>
                ((2L * (s + 127L * n) + n) / (2L * n) - 127L).toInt
              case None => books(j)(code)(pos) // empty code: keep codeword
            }
          }))
        it += 1
      }
      // Coarse quantizer: the same portable Lloyd loop the IVF index
      // trains with (q42's CTE-replayed contract) — double means over
      // the whole corpus, `coarseIters = 0` keeps the raw sample.
      val coarse =
        if (coarseIters <= 0) bigSample.take(c)
        else trainPortable(ds, idCol, c, coarseIters)
      IvfPqIndex(coarse = coarse, codebooks = books)
    }

    /** Rehydrate from a [[IvfPqIndex.toDF]] relation. */
    def fromDF(df: DataFrame): IvfPqIndex = {
      val rows = df.select(col("kind"), col("i").cast("int"),
          col("j").cast("int"), col("vec"))
        .collect()
        .map(r => (r.getString(0), r.getInt(1), r.getInt(2),
          r.getSeq[Double](3).toArray))
      val coarse = rows.filter(_._1 == "coarse").sortBy(_._2).map(_._4)
      val m = rows.filter(_._1 == "code").map(_._3).max + 1
      val codebooks = Array.tabulate(m)(j =>
        rows.filter(r => r._1 == "code" && r._3 == j)
          .sortBy(_._2).map(_._4.map(_.toInt)))
      IvfPqIndex(coarse, codebooks)
    }
  }

  /** IVF (inverted-file) coarse quantizer: deterministic Lloyd k-means.
    *
    * Init picks the `c` corpus vectors with the smallest md5(id) — a
    * deterministic uniform sample, no RNG state. Each iteration is one
    * Spark job: assign every vector to its nearest centroid (argmin over
    * `c` codegen dot products against literal centroid arrays — centroids
    * are plan-time constants, the same trick as the LSH planes), then an
    * element-wise mean per cluster (posexplode + groupBy — one shuffle of
    * dims*n skinny rows). Centroids (c × dims doubles) collect to the
    * driver between iterations — bounded and tiny relative to any corpus;
    * the corpus itself never leaves the executors.
    *
    * At 100 TB: `c` grows to ~sqrt(N) (tens of thousands); the argmin
    * should then move from c literal dot products to a single custom
    * all-centroids expression or a broadcast-join + per-partition BLAS
    * loop — noted here as the scale follow-up, the dataflow stays as-is.
    */
  def ivfCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      c: Int, iters: Int = 2): Array[Array[Double]] = {
    val ds = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("e"))
    var cents: Array[Array[Double]] = ds
      .withColumn("h", graft.functions.PortableHash
        .hash60Base(col("id").cast("string")))
      .orderBy(col("h"), col("id")).limit(c)
      .select(col("e")).collect().map(_.getSeq[Double](0).toArray)
    var it = 0
    while (it < iters) {
      val dims = cents.head.length
      val means = ds
        .withColumn("cluster", nearestCentroid(col("e"), cents))
        .select(col("cluster"), posexplode(col("e")).as(Seq("pos", "v")))
        .groupBy(col("cluster"), col("pos")).agg(avg(col("v")).as("m"))
        .groupBy(col("cluster"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("ms"))
        .select(col("cluster"), col("ms.m").as("centroid"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
      // empty clusters keep their previous centroid
      cents = Array.tabulate(cents.length)(i =>
        means.getOrElse(i, cents(i)).ensuring(_.length == dims))
      it += 1
    }
    cents
  }

  /** Index of the nearest centroid by L2. */
  def nearestCentroid(e: Column, cents: Array[Array[Double]]): Column =
    nearestCentroids(e, cents, 1).getItem(0)

  /** The `nProbe` nearest centroid indices, ascending by L2 distance
    * (rank key -2·(e·c) + |c|²; the |e|² term is constant per row),
    * ties broken by lower index.
    *
    * ONE codegen expression holding the whole centroid matrix as a
    * referenced object ([[graft.functions.CentroidOps]]) — plan node
    * count is O(1) in `c`, so the coarse quantizer scales to the
    * c ≈ √N (tens of thousands) a 100 TB corpus needs. The earlier
    * c-literal-dot-subtree formulation produced bit-identical results
    * but an O(c) plan tree; the swap is invisible to the q42 oracle
    * (PlanSizeSpec asserts both properties).
    */
  def nearestCentroids(e: Column, cents: Array[Array[Double]],
      nProbe: Int): Column =
    graft.functions.CentroidOps.nearestCol(e, cents, nProbe)

  /** IVF-accelerated cosine top-k: candidates are the members of the
    * `nProbe` clusters nearest each query; exact cosine re-rank on the
    * candidates only. `nProbe = c` degrades to exact brute force.
    *
    * Trains the quantizer inline — for repeated query batches against
    * one corpus, build an [[IvfIndex]] once instead.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, c: Int = 16, nProbe: Int = 4,
      iters: Int = 2): DataFrame =
    IvfIndex.build(corpus, idCol, vecCol, c, iters)
      .topK(queries, corpus, idCol, vecCol, k, nProbe)

  /** A trained IVF coarse quantizer: just the centroid matrix — tiny,
    * serializable, persistable (`save`/`load` via any catalog table), and
    * reusable across query batches without re-running Lloyd iterations.
    * The corpus-side bucket assignment stays a lazy plan-time projection,
    * so an updated corpus can reuse an older quantizer (standard IVF
    * practice: retrain only when the distribution drifts).
    */
  final case class IvfIndex(centroids: Array[Array[Double]]) {

    def c: Int = centroids.length

    def topK(queries: DataFrame, corpus: DataFrame, idCol: String,
        vecCol: String, k: Int, nProbe: Int): DataFrame = {
      val cb = corpus.select(col(idCol), col(vecCol),
        nearestCentroid(asDouble(col(vecCol)), centroids).as("bucket"))
      val qb = queries.select(col(idCol), col(vecCol),
        explode(nearestCentroids(asDouble(col(vecCol)), centroids, nProbe))
          .as("bucket"))
      bucketedTopK(qb, cb, idCol, vecCol, k)
    }

    /** Centroids as a DataFrame (cluster, centroid) — write it to any
      * table/catalog to persist the index.
      */
    def toDF(spark: org.apache.spark.sql.SparkSession): DataFrame = {
      import spark.implicits._
      centroids.zipWithIndex
        .map { case (cent, i) => (i, cent.toSeq) }.toSeq
        .toDF("cluster", "centroid")
    }
  }

  object IvfIndex {

    def build(corpus: DataFrame, idCol: String, vecCol: String,
        c: Int, iters: Int = 2): IvfIndex =
      IvfIndex(ivfCentroids(corpus, idCol, vecCol, c, iters))

    /** Rehydrate from a (cluster, centroid) DataFrame. */
    def fromDF(df: DataFrame): IvfIndex = IvfIndex(
      df.select(col("cluster").cast("int"), col("centroid"))
        .collect()
        .sortBy(_.getInt(0))
        .map(_.getSeq[Double](1).toArray))
  }

  private def bucketedTopK(qb0: DataFrame, cb0: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val qb = qb0
      .select(col(idCol).as("q_id"), asDouble(col(vecCol)).as("qe"),
        col("bucket"))
      .withColumn("nq", norm2(col("qe")))
    val cb = cb0
      .select(col(idCol).as("n_id"), asDouble(col(vecCol)).as("ce"),
        col("bucket"))
      .withColumn("nc", norm2(col("ce")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("n_id").asc)
    qb.join(cb, Seq("bucket"))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("cosine",
        dot(col("qe"), col("ce")) / sqrt(col("nq") * col("nc")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("cosine"), col("rank"))
  }
}
