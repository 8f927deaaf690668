package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DSIR importance resampling: the ratio table is dense and clamped,
  * importance orders target-like documents above raw-like ones, the
  * hash-gate keep set is a pure function of the row ids (layout
  * independent), and the threshold arithmetic replays in plain Scala.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 64

  // two disjoint vocabularies: "webby" filler vs "targety" prose
  private def rawDocs: DataFrame =
    ((1L to 30L).map { i =>
      (i, "click here free offer win prize now deal sale buy " +
        s"unique token$i")
    } ++ (31L to 40L).map { i =>
      (i, "the theorem follows from careful analysis of the lemma " +
        s"unique token$i")
    }).toDF("doc_id", "text")

  private def targetDocs: DataFrame =
    (101L to 110L).map { i =>
      (i, "the theorem follows from careful analysis of the lemma " +
        s"target token$i")
    }.toDF("doc_id", "text")

  test("ratio table is dense over dim buckets and within [0, RatioCap]") {
    val r = Dsir.bucketRatios(rawDocs, targetDocs, "doc_id", "text", Dim)
      .collect().map(row => (row.getLong(0), row.getLong(1)))
    assert(r.length === Dim)
    assert(r.map(_._1).toSet === (0L until Dim).toSet)
    assert(r.forall { case (_, v) => v >= 0 && v <= Dsir.RatioCap })
  }

  test("importance orders target-like docs above raw-like docs") {
    val ratios = Dsir.bucketRatios(rawDocs, targetDocs, "doc_id", "text",
      Dim)
    val imp = Dsir.importance(rawDocs, ratios, "doc_id", "text", Dim)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val webby = (1L to 30L).map(imp)
    val targety = (31L to 40L).map(imp)
    assert(targety.min > webby.max,
      s"targety ${targety.min} should exceed webby ${webby.max}")
  }

  test("resample threshold and keep replay in plain Scala; expected " +
      "keep skews toward the target") {
    val out = Dsir.resample(rawDocs, targetDocs, "doc_id", "text", Dim,
      keepPpm = 500000L)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(rows.length === 40)
    val imps = rows.map(r => r._1 -> r._3).toMap
    val mean = math.max(1L, imps.values.sum / imps.size)
    rows.foreach { case (id, _, imp, th, keep) =>
      val expTh = math.min(Mixture.Unit, 500000L * imp / mean)
      assert(th === expTh, s"threshold doc $id")
      // replay the md5 gate
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"dsir:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val gate = java.lang.Long.parseLong(md.take(15), 16) % Mixture.Unit
      assert(keep === (gate < expTh), s"keep doc $id")
    }
    // thresholds must order with importance: every targety doc's
    // threshold >= every webby doc's
    val thMap = rows.map(r => r._1 -> r._4).toMap
    assert((31L to 40L).map(thMap).min >= (1L to 30L).map(thMap).max)
  }

  test("keep set is layout-independent") {
    def keeps(df: DataFrame): Set[Long] =
      Dsir.resample(df, targetDocs, "doc_id", "text", Dim, 500000L)
        .filter(col("keep")).select("doc_id").collect()
        .map(_.getLong(0)).toSet
    val a = keeps(rawDocs)
    val b = keeps(rawDocs.repartition(7, col("doc_id")))
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("fit on the full corpus + applyModel == resample") {
    val m = Dsir.fit(rawDocs, targetDocs, "doc_id", "text", Dim, 500000L)
    val applied = Dsir.applyModel(m, rawDocs, "doc_id", "text")
      .orderBy(col("doc_id")).collect().map(_.toSeq).toSeq
    val oneShot = Dsir.resample(rawDocs, targetDocs, "doc_id", "text",
      Dim, 500000L).orderBy(col("doc_id")).collect().map(_.toSeq).toSeq
    assert(applied == oneShot)
  }

  test("applyModel is batching-independent against the frozen model") {
    val m = Dsir.fit(rawDocs.filter($"doc_id" % 3 === 0), targetDocs,
      "doc_id", "text", Dim, 500000L)
    def part(r: Int) = Dsir.applyModel(m,
      rawDocs.filter($"doc_id" % 2 === r), "doc_id", "text")
    val batched = part(0).unionByName(part(1))
      .collect().map(_.toSeq).toSet
    val oneShot = Dsir.applyModel(m, rawDocs, "doc_id", "text")
      .collect().map(_.toSeq).toSet
    assert(batched == oneShot && oneShot.nonEmpty)
  }

  test("gate salt differs from the Mixture sample gate on the same ids") {
    // same id, different salts — thresholds at 50% must disagree on
    // SOME id in a 40-doc corpus if the gates are independent
    val ids = (1L to 40L)
    val dsirGate = ids.map { i =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"dsir:$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(15), 16) % Mixture.Unit < 500000L
    }
    val plainGate = ids.map { i =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(15), 16) % Mixture.Unit < 500000L
    }
    assert(dsirGate != plainGate)
  }
}
