package graft.pipeline

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Sequence packing: the packed layout must tile each stream's token
  * tape exactly — contiguous starts, in-range offsets, straddle counts
  * consistent with the cut points — and be layout-independent.
  */
class PackingSpec extends SparkSpec {

  private val L = 128
  private def docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    .select(col("doc_id"), col("text"))

  test("streams tile contiguously: each doc starts where the previous ended") {
    val rows = Packing.packSequences(docs, "doc_id", "text",
        seqLen = L, numGroups = 4)
      .orderBy(col("grp"), col("doc_id"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))) // grp, n_tok, start
    rows.groupBy(_._1).values.foreach { g =>
      g.sliding(2).foreach {
        case Array((_, n, s), (_, _, s2)) => assert(s2 == s + n)
        case _ =>
      }
      assert(g.head._3 == 0L) // first doc of every stream starts at 0
    }
  }

  test("placement fields are consistent with the cut points") {
    Packing.packSequences(docs, "doc_id", "text", seqLen = L, numGroups = 4)
      .collect().foreach { r =>
        val (n, start, seqF, off, nSeqs) = (r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6))
        assert(n > 0)
        assert(off >= 0 && off < L)
        assert(seqF == start / L && off == start % L)
        assert(nSeqs == (start + n - 1) / L - seqF + 1)
      }
  }

  test("single stream matches a plain-Scala prefix sum (two-phase correctness)") {
    // numGroups = 1 is the worst case for the old single-window plan:
    // the whole corpus was one window partition. The two-phase plan
    // must produce the same tape while slicing it across tasks.
    val got = Packing.packSequences(docs, "doc_id", "text", L, numGroups = 1)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(6))) // id, start, n_seqs
    val toks = docs
      .select(col("doc_id"),
        graft.text.TextAnalysis.tokenCount(col("text")).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(_._2 > 0).sortBy(_._1)
    var cum = 0L
    val want = toks.map { case (id, n) =>
      val start = cum; cum += n
      (id, start, (cum - 1) / L - start / L + 1)
    }
    assert(got.toSeq == want.toSeq)
  }

  test("plan is two-phase: range slicing, no stream-sized window partition") {
    // The slicing phase (behind prefixSum's one materialization) must
    // range-exchange and key the per-row window by (grp, cell), never
    // grp alone — packing's old scale-killer.
    import org.apache.spark.sql.functions.col
    val counted = docs.selectExpr("doc_id",
      "cast(doc_id % 4 as long) as grp", "cast(1 as long) as n_tok")
    val plan = graft.operators.TwoPhase
      .slicedWithin(counted, Seq("grp"), Seq("doc_id"), col("n_tok"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"),
      s"expected a range exchange in:\n$plan")
    assert(plan.contains("__tp_cell"),
      s"expected cell-sliced windows in:\n$plan")
    // and the OUTPUT consumes one materialized slicing, never a
    // re-planned (divergence-prone) second range exchange
    val out = Packing.packSequences(docs, "doc_id", "text", L, 4)
      .queryExecution.executedPlan.toString
    assert(out.contains("ExistingRDD"),
      s"expected the materialized slicing scan in:\n$out")
    assert(!out.contains("rangepartitioning"), out)
  }

  test("sequence manifest tiles every sequence exactly") {
    val placed = Packing.packSequences(docs, "doc_id", "text", L, 4)
    val m = Packing.sequenceManifest(placed, "doc_id", L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))) // grp, seq, doc, from, to, seq_from
    // group by (grp, seq): spans are contiguous from seq_from 0 or the
    // first doc's offset, and each non-final sequence holds exactly L
    val byGrp = m.groupBy(_._1)
    byGrp.foreach { case (_, rows) =>
      val bySeq = rows.groupBy(_._2)
      val lastSeq = bySeq.keys.max
      bySeq.foreach { case (seq, spans) =>
        val sorted = spans.sortBy(_._6)
        // spans tile: each starts where the previous ended
        sorted.sliding(2).foreach {
          case Array(a, b) => assert(b._6 == a._6 + (a._5 - a._4))
          case _ =>
        }
        val total = spans.map(s => s._5 - s._4).sum
        if (seq < lastSeq) assert(sorted.head._6 == 0L && total == L.toLong,
          s"seq $seq not fully tiled: $total")
      }
    }
    // every document's spans cover [0, n_tok) exactly
    val placedMap = placed.collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    m.groupBy(_._3).foreach { case (doc, spans) =>
      val sorted = spans.sortBy(_._4)
      assert(sorted.head._4 == 0L && sorted.last._5 == placedMap(doc))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._4 == a._5)
        case _ =>
      }
    }
  }

  test("epoch-shard manifest tiles exactly per (epoch, shard) and " +
      "covers every tokened doc once per epoch") {
    val epochs = 2
    val shards = 4
    val m = Packing.epochShardManifest(docs, "doc_id", "text",
        epochs = epochs, nShards = shards, seqLen = L)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // (epoch, shard, seq, doc, from, to, seq_from)
    assert(m.map(_._1).toSet == (0 until epochs).toSet)
    assert(m.map(_._2).toSet == (0 until shards).toSet)
    // tiling within each (epoch, shard) stream
    m.groupBy(x => (x._1, x._2)).foreach { case (_, rows) =>
      val bySeq = rows.groupBy(_._3)
      val lastSeq = bySeq.keys.max
      bySeq.foreach { case (seq, spans) =>
        val sorted = spans.sortBy(_._7)
        sorted.sliding(2).foreach {
          case Array(a, b) => assert(b._7 == a._7 + (a._6 - a._5))
          case _ =>
        }
        val total = spans.map(s => s._6 - s._5).sum
        if (seq < lastSeq) assert(sorted.head._7 == 0L && total == L.toLong)
      }
    }
    // each epoch covers every tokened document exactly ([0, n_tok))
    val nTok = docs
      .select(col("doc_id"),
        graft.text.TextAnalysis.tokenCount(col("text")).cast("long")
          .as("n"))
      .filter(col("n") > 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (e <- 0 until epochs) {
      val byDoc = m.filter(_._1 == e).groupBy(_._4)
      assert(byDoc.keySet == nTok.keySet)
      byDoc.foreach { case (doc, spans) =>
        val sorted = spans.sortBy(_._5)
        assert(sorted.head._5 == 0L && sorted.last._6 == nTok(doc))
        sorted.sliding(2).foreach {
          case Array(a, b) => assert(b._5 == a._6)
          case _ =>
        }
      }
    }
    // the permutation differs between epochs (same docs, different
    // shard deal) — a degenerate identical shuffle would defeat the
    // point of per-epoch reshuffling
    val deal = (e: Int) => m.filter(_._1 == e)
      .map(x => x._4 -> x._2).distinct.sortBy(_._1).toSeq
    assert(deal(0) != deal(1))
  }

  test("deterministic under repartitioning") {
    val a = Packing.packSequences(docs, "doc_id", "text", L, 4)
      .orderBy("doc_id").collect().toSeq
    val b = Packing.packSequences(docs.repartition(13), "doc_id", "text", L, 4)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("tokenShards: shards balanced to within one document") {
    val S = 8
    val out = Packing.tokenShards(docs, "doc_id", "text", S).cache()
    val perShard = out.groupBy(col("shard"))
      .agg(sum(col("n_tok")).as("tok"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perShard.keySet == (0L until S).toSet, s"shards: $perShard")
    val maxDoc = out.agg(max(col("n_tok"))).first().getLong(0)
    val toks = perShard.values
    // contiguous token-tape cuts: any two shards differ by at most
    // one boundary-straddling document on each side
    assert(toks.max - toks.min <= 2 * maxDoc,
      s"imbalance ${toks.max - toks.min} vs maxDoc $maxDoc")
    // every positive-token doc assigned exactly once
    val inDocs = docs.select(col("doc_id"))
      .filter(graft.text.TextAnalysis.tokenCount(col("text")) > 0)
    assert(out.count() == inDocs.count())
    // layout determinism
    val again = Packing.tokenShards(docs.repartition(13), "doc_id",
        "text", S)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(again == out.collect().map(r => (r.getLong(0), r.getLong(2))).toSet)
    out.unpersist(blocking = false)
  }

  test("chunkManifest: chunks tile with overlap, cover every token, " +
      "clamp at the end, layout-independent") {
    val (w, s) = (64, 48)
    val rows = Packing.chunkManifest(docs, "doc_id", "text", w, s)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (id, cs) =>
      val n = cs.head._2
      val sorted = cs.sortBy(_._3)
      // chunk numbers dense from 0
      assert(sorted.map(_._3) == (0L until cs.size).toSeq)
      sorted.foreach { case (_, _, k, f, t) =>
        assert(f == k * s && t == math.min(f + w, n), s"doc $id chunk $k")
        assert(t > f)
      }
      // full coverage: last chunk reaches the end; consecutive chunks
      // overlap by w - s (or touch the clamped end)
      assert(sorted.last._5 == n)
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(b._4 < a._5, s"gap in doc $id")
        case _ =>
      }
      // no redundant trailing chunk: the previous chunk must NOT
      // already cover the document
      if (cs.size > 1) assert(sorted(cs.size - 2)._5 < n)
    }
    val again = Packing.chunkManifest(docs.repartition(13), "doc_id",
        "text", w, s).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(again.toSet == rows.toSet)
  }

  test("lengthBatches: buckets bound lengths, batches dense and full, " +
      "positions dense, layout-independent") {
    val (w, bs) = (32, 16)
    val rows = Packing.lengthBatches(docs, "doc_id", "text", w, bs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(rows.nonEmpty)
    // bucket bound: b*w < n_tok <= (b+1)*w
    rows.foreach { case (id, n, b, _, _) =>
      assert(b * w < n && n <= (b + 1) * w, s"doc $id n=$n bucket=$b")
    }
    rows.groupBy(_._3).foreach { case (b, ms) =>
      val byBatch = ms.groupBy(_._4)
      // batches dense from 0; all full except possibly the last
      val nb = byBatch.keys.max + 1
      assert(byBatch.keySet == (0L until nb).toSet)
      byBatch.foreach { case (k, bm) =>
        if (k < nb - 1) assert(bm.size == bs, s"bucket $b batch $k short")
        else assert(bm.size <= bs)
        // positions dense within the batch
        assert(bm.map(_._5).sorted == (0L until bm.size).toSeq)
      }
    }
    val again = Packing.lengthBatches(docs.repartition(13), "doc_id",
        "text", w, bs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(again.toSet == rows.toSet)
  }
}
