package graft.pipeline

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Curriculum schedule: admission ramps down monotonically to the full
  * corpus, the global order is dense and band-ordered within each
  * epoch, and the schedule is layout-independent.
  */
class CurriculumSpec extends SparkSpec {

  private def docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    .select(col("doc_id"), col("text"))

  private def rows = Curriculum.schedule(docs, "doc_id", "text",
      epochs = 3, bands = 5)
    .collect()
    .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    .toSeq

  test("admission grows monotonically; the last epoch admits every doc") {
    val byEpoch = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert(byEpoch(0).subsetOf(byEpoch(1)) &&
      byEpoch(1).subsetOf(byEpoch(2)))
    assert(byEpoch(2).size.toLong == docs.count())
    // the ramp is real: early epochs admit strictly fewer docs
    assert(byEpoch(0).size < byEpoch(2).size)
    // epoch 0 admits ONLY the top band
    assert(rows.filter(_._1 == 0).forall(_._3 == 4L))
  }

  test("ord is a dense global order: epochs in order, bands " +
      "descending within each epoch") {
    val sorted = rows.sortBy(_._4)
    assert(sorted.map(_._4) == (1L to rows.size.toLong))
    // non-decreasing epoch along the schedule
    assert(sorted.map(_._1.toLong) == sorted.map(_._1.toLong).sorted)
    // within an epoch, band never increases along the order
    sorted.groupBy(_._1).foreach { case (_, es) =>
      val bands = es.sortBy(_._4).map(_._3)
      assert(bands == bands.sortBy(-_))
    }
  }

  test("schedule is layout-independent") {
    val again = Curriculum.schedule(docs.repartition(13), "doc_id",
        "text", epochs = 3, bands = 5)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(again.toSet == rows.toSet)
  }
}
