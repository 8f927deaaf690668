package graft.text

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** BM25 over a term RELATION: a second (non-q99) term set is computed
  * independently in plain Scala — same rational idf, same k1/b, same
  * term-sorted strict left fold — and compared value-for-value.
  */
class Bm25Spec extends SparkSpec {

  private def docs = Tables(spark, "/root/testdata/sf0.001", "documents")

  private def reference(terms: Seq[String], k: Int,
      k1: Double, b: Double): Seq[(Long, Double, Int)] = {
    val toks = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).split("\\s+").filter(_.nonEmpty).toSeq)
    val withTok = toks.filter(_._2.nonEmpty)
    val nd = withTok.length
    val avgdl = withTok.map(_._2.length.toLong).sum.toDouble / nd
    val tf = withTok.map { case (id, ts) =>
      id -> terms.map(t => t -> ts.count(_ == t).toLong)
        .filter(_._2 > 0).toMap
    }.toMap
    val df = terms.map(t => t -> tf.values.count(_.contains(t)).toLong).toMap
    val scored = withTok.flatMap { case (id, ts) =>
      val dl = ts.length.toLong
      val perTerm = tf(id).toSeq.sortBy(_._1).map { case (t, n) =>
        (nd.toDouble - df(t) + 0.5) / (df(t) + 0.5) *
          (n * (k1 + 1.0)) /
          (n + k1 * ((1.0 - b) + b * (dl / avgdl)))
      }
      val bm25 = perTerm.foldLeft(0.0)(_ + _)
      if (bm25 > 0) Some((id, bm25)) else None
    }
    scored.sortBy { case (id, s) => (-s, id) }.take(k)
      .zipWithIndex.map { case ((id, s), i) => (id, s, i + 1) }.toSeq
  }

  test("second term set matches a plain-Scala replay exactly") {
    import spark.implicits._
    val terms = Seq("data", "group", "stream", "select", "window")
    val got = Bm25.rank(docs, "doc_id", "text", terms.toDF("term"), k = 15)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq
      .sortBy(_._3)
    assert(got == reference(terms, 15, 1.2, 0.75))
  }

  test("non-default k1/b parameters flow through") {
    import spark.implicits._
    val terms = Seq("table", "index")
    val got = Bm25.rank(docs, "doc_id", "text", terms.toDF("term"),
        k = 10, k1 = 1.5, b = 0.5)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq
      .sortBy(_._3)
    assert(got == reference(terms, 10, 1.5, 0.5))
  }

  test("deterministic under repartitioning") {
    import spark.implicits._
    val terms = Seq("data", "query").toDF("term")
    val a = Bm25.rank(docs, "doc_id", "text", terms, k = 10).collect().toSeq
    val b = Bm25.rank(docs.repartition(13), "doc_id", "text", terms, k = 10)
      .collect().toSeq
    assert(a == b)
  }
}
