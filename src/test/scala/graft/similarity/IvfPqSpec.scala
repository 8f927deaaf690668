package graft.similarity

import graft.SparkSpec
import graft.functions.TextHash
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** IVF-PQ: the whole pipeline (sampled coarse quantizer, subspace
  * codebooks, encoding, probe routing, exact-integer ADC scores, ranks)
  * is recomputed independently in plain Scala and compared tuple for
  * tuple; plus layout-independence and recall sanity vs brute force.
  */
class IvfPqSpec extends SparkSpec {

  private val (c, m, nProbe, k, kCodes) = (8, 8, 3, 5, 64)
  private def emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")

  /** Plain-Scala replay of the operator's contract. */
  private def reference(): Set[(Long, Long, Double, Int)] = {
    val vecs = emb.select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    // int8-range quantization, HALF_UP = away-from-zero like SQL round
    def quant(e: Array[Double]): Option[Array[Long]] = {
      val mab = e.map(math.abs).max
      if (mab <= 0) None
      else Some(e.map(x => java.math.BigDecimal.valueOf(x * 127.0 / mab)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()))
    }
    val qz = vecs.flatMap { case (id, e) => quant(e).map(id -> _) }
    val big = qz.sortBy { case (id, _) =>
      (TextHash.md5Low60(id.toString), id) }
      .take(math.max(c, kCodes)).map(_._2)
    val sample = big.take(c)
    val cbSample = big.take(kCodes)
    val dims = sample.head.length
    val sub = dims / m
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    def argmin(v: Array[Long], cents: Array[Array[Long]], n: Int): Seq[Int] =
      cents.zipWithIndex
        .map { case (ct, i) => (-2L * dot(v, ct) + dot(ct, ct), i) }
        .sortBy(identity).take(n).map(_._2).toSeq
    // double-centroid variant (post-Lloyd coarse): strict left-fold dot
    // + |c|² rank key, lower index on ties — the engine's argmin
    def argminD(v: Array[Long], cents: Array[Array[Double]], n: Int): Seq[Int] =
      cents.zipWithIndex
        .map { case (ct, i) =>
          var acc = 0.0
          var j = 0
          while (j < ct.length) { acc += v(j) * ct(j); j += 1 }
          (-2.0 * acc + ct.map(y => y * y).sum, i)
        }
        .sortBy(identity).take(n).map(_._2).toSeq
    // coarse Lloyd (2 rounds, trainPortable's arithmetic): exact-int
    // sums cast to double means; empty clusters keep their centroid
    var coarse: Array[Array[Double]] = sample.map(_.map(_.toDouble))
    for (_ <- 0 until 2) {
      val sums = scala.collection.mutable.Map[(Int, Int), (Long, Long)]()
      qz.foreach { case (_, v) =>
        val cl = argminD(v, coarse, 1).head
        v.indices.foreach { p =>
          val (s, n) = sums.getOrElse((cl, p), (0L, 0L))
          sums((cl, p)) = (s + v(p), n + 1)
        }
      }
      coarse = Array.tabulate(coarse.length)(cl =>
        if (sums.contains((cl, 0)))
          Array.tabulate(dims) { p =>
            val (s, n) = sums((cl, p)); s.toDouble / n.toDouble
          }
        else coarse(cl))
    }
    // per-subspace Lloyd: assign every corpus subvector, then update
    // each codeword component to the shifted round-half-up integer mean
    // (exactly buildFromQuantized's arithmetic)
    var cw: Array[Array[Array[Long]]] =
      Array.tabulate(m)(j => cbSample.map(_.slice(j * sub, (j + 1) * sub)))
    for (_ <- 0 until 2) {
      val sums = scala.collection.mutable.Map[(Int, Int, Int), (Long, Long)]()
      qz.foreach { case (_, v) =>
        (0 until m).foreach { j =>
          val sv = v.slice(j * sub, (j + 1) * sub)
          val code = argmin(sv, cw(j), 1).head
          (0 until sub).foreach { p =>
            val (s, n) = sums.getOrElse((j, code, p), (0L, 0L))
            sums((j, code, p)) = (s + sv(p), n + 1)
          }
        }
      }
      cw = Array.tabulate(m)(j => Array.tabulate(cw(j).length)(code =>
        Array.tabulate(sub) { p =>
          sums.get((j, code, p)) match {
            case Some((s, n)) => (2L * (s + 127L * n) + n) / (2L * n) - 127L
            case None => cw(j)(code)(p)
          }
        }))
    }
    val cb = qz.map { case (id, v) => (id, argminD(v, coarse, 1).head,
      Array.tabulate(m)(j =>
        argmin(v.slice(j * sub, (j + 1) * sub), cw(j), 1).head)) }
    val byBucket = cb.groupBy(_._2)
    qz.filter(_._1 < 50).flatMap { case (qid, qv) =>
      val cands = argminD(qv, coarse, nProbe)
        .flatMap(b => byBucket.getOrElse(b, Array.empty).toSeq)
        .filter(_._1 != qid)
      val nq = dot(qv, qv)
      cands.map { case (nid, _, codes) =>
        val s = (0 until m).map(j =>
          dot(qv.slice(j * sub, (j + 1) * sub), cw(j)(codes(j)))).sum
        val nc = (0 until m).map(j =>
          dot(cw(j)(codes(j)), cw(j)(codes(j)))).sum
        (nid, s.toDouble / math.sqrt((nq * nc).toDouble))
      }.sortBy { case (nid, s) => (-s, nid) }
        .take(k).zipWithIndex
        .map { case ((n, s), i) => (qid, n, s, i + 1) }
    }.toSet
  }

  private def run(corpus: org.apache.spark.sql.DataFrame) =
    Similarity.ivfPqTopK(emb.filter(col("vec_id") < 50), corpus,
        "vec_id", "embedding", k = k, c = c, m = m, nProbe = nProbe,
        kCodes = kCodes)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet

  test("scores and ranks match an independent plain-Scala replay exactly") {
    assert(run(emb) == reference())
  }

  test("deterministic under repartitioning") {
    assert(run(emb.repartition(13)) == run(emb))
  }

  test("full probe over one coarse cell ranks like exact quantized ADC") {
    // c=1: every vector lands in the single bucket, so the candidate set
    // is the whole corpus and ranking is pure ADC — top-1 of a query
    // against itself-duplicates must be deterministic and k rows per query
    val out = Similarity.ivfPqTopK(emb.filter(col("vec_id") < 10), emb,
      "vec_id", "embedding", k = 3, c = 1, m = m, nProbe = 1,
      kCodes = kCodes)
    val counts = out.groupBy("q_id").count().collect().map(_.getLong(1))
    assert(counts.nonEmpty && counts.forall(_ == 3))
  }

  test("index + compressed relation persist through catalog tables and " +
      "answer identically without the original vectors") {
    import graft.catalog.ParquetCatalog
    val idx = Similarity.IvfPqIndex.build(emb, "vec_id", "embedding",
      c = c, m = m, kCodes = kCodes)
    val cat = new ParquetCatalog(spark,
      java.nio.file.Files.createTempDirectory("graft-pq").toString)
    cat.create("pq_idx", idx.toDF(spark).schema)
    cat.overwrite("pq_idx", idx.toDF(spark))
    val loaded = Similarity.IvfPqIndex.fromDF(cat.table("pq_idx"))
    assert(loaded.coarse.map(_.toSeq).toSeq == idx.coarse.map(_.toSeq).toSeq)
    assert(loaded.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      idx.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    // the compressed relation is the queryable artifact: write it,
    // answer top-k from the TABLE — the float embeddings never load
    val enc = loaded.encode(emb, "vec_id", "embedding")
    cat.create("pq_enc", enc.schema)
    cat.overwrite("pq_enc", enc)
    val fromTable = loaded.topK(emb.filter(col("vec_id") < 50),
        cat.table("pq_enc"), "vec_id", "embedding", k, nProbe)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    assert(fromTable == run(emb))
  }

  test("recall sanity vs brute-force cosine") {
    val q = emb.filter(col("vec_id") < 20)
    val brute = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = run(emb).map { case (qid, nid, _, _) => (qid, nid) }
      .filter(_._1 < 20)
    val recall = (brute intersect pq).size.toDouble / brute.size
    assert(recall >= 0.2, s"recall $recall") // compressed + sampled codebook
  }

  test("refine tail: exact re-rank of ADC candidates matches a " +
      "plain-Scala re-score tuple for tuple") {
    val q = emb.filter(col("vec_id") < 20)
    val idx = Similarity.IvfPqIndex.build(emb, "vec_id", "embedding",
      c = c, m = m, kCodes = kCodes)
    val enc = idx.encode(emb, "vec_id", "embedding").localCheckpoint()
    val refined = idx.topKRefined(q, enc, emb, "vec_id", "embedding",
        k, nProbe, refineR = 50)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    // independent tail: ADC top-50 from the SAME index, then an exact
    // double-cosine re-score in plain Scala (strict left-fold dots)
    val cand = idx.topK(q, enc, "vec_id", "embedding", 50, nProbe)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val v = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    val expected = cand.groupBy(_._1).toSeq.flatMap { case (qid, ns) =>
      ns.toSeq.map { case (_, nid) =>
        (nid, dot(v(qid), v(nid)) /
          math.sqrt(dot(v(qid), v(qid)) * dot(v(nid), v(nid))))
      }.sortBy { case (nid, cos) => (-cos, nid) }
        .take(k).zipWithIndex
        .map { case ((nid, cos), i) => (qid, nid, cos, i + 1) }
    }.toSet
    assert(refined == expected)
  }

  test("refine tail never loses recall vs ADC-only ranking") {
    val q = emb.filter(col("vec_id") < 100)
    val brute = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val idx = Similarity.IvfPqIndex.build(emb, "vec_id", "embedding",
      c = c, m = m, kCodes = kCodes)
    val enc = idx.encode(emb, "vec_id", "embedding").localCheckpoint()
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val adc = pairs(idx.topK(q, enc, "vec_id", "embedding", k, nProbe))
    val ref = pairs(idx.topKRefined(q, enc, emb, "vec_id", "embedding",
      k, nProbe, refineR = 100))
    val rAdc = (brute intersect adc).size.toDouble / brute.size
    val rRef = (brute intersect ref).size.toDouble / brute.size
    assert(rRef >= rAdc, s"refined recall $rRef < ADC recall $rAdc")
  }

  test("trained codebooks beat the untrained sample on recall") {
    // Full single-cell probe isolates PQ reconstruction quality: the
    // candidate set is the whole corpus, so recall differences come
    // only from the codebooks. Lloyd-refined codewords must not lose
    // to the raw sample slices they were initialized from.
    val q = emb.filter(col("vec_id") < 100)
    val brute = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(iters: Int): Double = {
      val pq = Similarity.ivfPqTopK(q, emb, "vec_id", "embedding",
          k = 10, c = 1, m = m, nProbe = 1, kCodes = 16, pqIters = iters)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (brute intersect pq).size.toDouble / brute.size
    }
    val (untrained, trained) = (recall(0), recall(2))
    assert(trained > untrained,
      s"trained recall $trained <= untrained $untrained")
  }
}
