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
}
