package graft.quality

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-source snapshot drift: identical snapshots score exactly 0, a
  * planted distribution shift stands out against unshifted sources,
  * the score matches plain-Scala arithmetic, and the result is
  * layout-independent.
  */
class DriftSpec extends SparkSpec {

  import spark.implicits._

  private def docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    .select(col("doc_id"), col("source"), col("text"))

  private def rows(df: DataFrame): Map[String, (Long, Long, Long)] =
    df.select(col("source"), col("n_a"), col("n_b"), col("drift"))
      .collect().toSeq
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap

  test("identical snapshots drift exactly 0") {
    val out = rows(Drift.sourceDrift(docs, docs, "doc_id", "source",
      "text"))
    assert(out.nonEmpty)
    out.foreach { case (s, (na, nb, d)) =>
      assert(na == nb && d == 0L, s"source $s: $na/$nb drift $d")
    }
  }

  test("a planted shift stands out against unshifted sources") {
    val srcnum = substring(col("source"), 4, 10).cast("int")
    val planted = docs.select(col("doc_id"), col("source"),
      concat(col("text"),
        when(srcnum === 1 && expr("(doc_id div 20) % 2") === 1,
        lit(" zz0 zz1 zz2 zz3 zz4 zz5 zz6 zz7")).otherwise(lit("")))
        .as("text"))
    val out = rows(Drift.sourceDrift(
      planted.filter(expr("(doc_id div 20) % 2") === 0),
      planted.filter(expr("(doc_id div 20) % 2") === 1),
      "doc_id", "source", "text"))
    val drifted = out.filter(_._1 == "src1")
    assert(drifted.size == 1)
    val others = out -- drifted.keySet
    assert(others.nonEmpty)
    assert(drifted.values.head._3 > others.values.map(_._3).max,
      s"planted ${drifted.values.head._3} vs ${others.values.map(_._3).max}")
  }

  test("score matches plain-Scala arithmetic on a hand fixture") {
    val a = Seq((1L, "s", "a b a"), (2L, "s", "b c"))
      .toDF("doc_id", "source", "text")
    val b = Seq((3L, "s", "a b"), (4L, "s", "c c d"))
      .toDF("doc_id", "source", "text")
    def feats(ds: Seq[Seq[String]]): Seq[String] =
      ds.flatMap(ts => ts ++ ts.zip(ts.tail).map(p => p._1 + " " + p._2))
    val fa = feats(Seq(Seq("a", "b", "a"), Seq("b", "c")))
    val fb = feats(Seq(Seq("a", "b"), Seq("c", "c", "d")))
    // bucket mapping from the engine's own hash expression (the hash
    // itself is verified in TextClassifySpec; this test pins the
    // histogram, ppm, and L2 arithmetic around it)
    val bmap = (fa ++ fb).distinct.toDF("f")
      .select(col("f"), graft.text.TextClassify.bucket(col("f"), 256)
        .as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def hist(fs: Seq[String]): Map[Long, Long] =
      fs.groupBy(bmap).map { case (k, v) => k -> v.size.toLong }
    val ha = hist(fa)
    val hb = hist(fb)
    val na = ha.values.sum
    val nb = hb.values.sum
    val want = (ha.keySet ++ hb.keySet).toSeq.map { k =>
      val dev = ha.getOrElse(k, 0L) * 1000000L / na -
        hb.getOrElse(k, 0L) * 1000000L / nb
      dev * dev
    }.sum
    val out = rows(Drift.sourceDrift(a, b, "doc_id", "source", "text"))
    assert(out("s") == ((na, nb, want)))
  }

  test("result is layout-independent") {
    val a = docs.filter(expr("(doc_id div 20) % 2") === 0)
    val b = docs.filter(expr("(doc_id div 20) % 2") === 1)
    val x = rows(Drift.sourceDrift(a, b, "doc_id", "source", "text"))
    val y = rows(Drift.sourceDrift(a.repartition(7, col("doc_id")),
      b.repartition(3), "doc_id", "source", "text"))
    assert(x == y && x.nonEmpty)
  }
}
