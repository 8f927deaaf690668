package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Per-source calibrated quality gate: rank cut == per-source quantile
  * threshold; sources gate against their OWN distributions.
  */
class CalibrateSpec extends SparkSpec {

  import spark.implicits._

  test("each source keeps its top fraction; ranks dense by quality desc") {
    // source A: rich text (high quality); source B: junk-heavy — an
    // absolute threshold would treat them unequally, the rank cut
    // keeps 1/2 of EACH
    val docs = (1L to 8L).map { i =>
      val src = if (i <= 4) "A" else "B"
      val text =
        if (src == "A") s"the quick brown fox $i of a thing and it is here today again now"
        else if (i % 2 == 1) s"the plain sample text $i of a kind and it is small but fine still"
        else s"@@##$$%% ^^&&**(( ))__++ x$i"
      (i, src, text)
    }.toDF("doc_id", "source", "text")
    val out = Calibrate.topFractionBySource(docs, "doc_id", "source",
        "text", keepNum = 1, keepDen = 2)
      .collect().map(r => (r.getLong(0),
        (r.getString(1), r.getLong(3), r.getLong(4), r.getBoolean(5))))
      .toMap
    // per source: 4 docs, keep = rank <= 2
    Seq("A", "B").foreach { s =>
      val rows = out.values.filter(_._1 == s).toSeq
      assert(rows.map(_._2).sorted == Seq(1L, 2L, 3L, 4L))
      assert(rows.count(_._4) == 2)
      assert(rows.forall(r => r._3 == 4L))
    }
    // B's junk docs (even ids) rank below its plain docs
    assert(out(6L)._2 > out(5L)._2 && out(8L)._2 > out(7L)._2)
  }

  test("rank cut matches ceil arithmetic on uneven sources") {
    val docs = (1L to 5L).map(i => (i, "S", s"tiny $i"))
      .toDF("doc_id", "source", "text")
    val kept = Calibrate.topFractionBySource(docs, "doc_id", "source",
        "text", keepNum = 3, keepDen = 4)
      .filter(col("keep")).count()
    assert(kept == 4) // ceil(5 * 3/4) = 4
  }

  test("rank buckets: per-source thirds on skewed distributions") {
    // A's scores all sit ABOVE B's — a global cut would put all of A
    // in the head; per-source banding gives each source its own thirds
    val rows = (1L to 6L).map(i => (i, "A", 100.0 + i)) ++
      (11L to 16L).map(i => (i, "B", i.toDouble / 100))
    val docs = rows.toDF("doc_id", "source", "score")
    val out = Calibrate.rankBucketsBySource(docs, "doc_id", "source",
        "score", nBuckets = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(5)))).toMap
    // 6 docs per source -> buckets of 2; rank 1 = highest score
    Seq("A" -> Seq(6L, 5L, 4L, 3L, 2L, 1L),
        "B" -> Seq(16L, 15L, 14L, 13L, 12L, 11L)).foreach {
      case (_, byScoreDesc) =>
        byScoreDesc.zipWithIndex.foreach { case (id, i) =>
          assert(out(id) == ((i + 1L, i / 2L)),
            s"doc $id expected rank ${i + 1} bucket ${i / 2}, got ${out(id)}")
        }
    }
  }

  test("rank buckets: uneven n, ties broken by id, bucket monotone") {
    // 5 docs, 3 buckets: ranks 1-5 -> (r-1)*3 div 5 = 0,0,1,1,2
    val docs = Seq((1L, "S", 9.0), (2L, "S", 9.0), (3L, "S", 5.0),
      (4L, "S", 5.0), (5L, "S", 1.0)).toDF("doc_id", "source", "score")
    val out = Calibrate.rankBucketsBySource(docs, "doc_id", "source",
        "score", nBuckets = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(5))))
      .toMap
    assert(out == Map(1L -> ((1L, 0L)), 2L -> ((2L, 0L)),
      3L -> ((3L, 1L)), 4L -> ((4L, 1L)), 5L -> ((5L, 2L))))
  }
}
