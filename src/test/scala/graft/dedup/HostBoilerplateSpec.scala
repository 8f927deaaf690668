package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HostBoilerplateSpec extends SparkSpec {
  import spark.implicits._

  test("host-relative threshold scrubs per site, not per corpus") {
    // host A: "nav" on 3/4 docs (75% >= 50%) -> scrubbed on A only.
    // host B: the SAME line on 1/4 docs (25%) -> kept on B.
    val docs = Seq(
      (1L, "a.com", "nav\nalpha"), (2L, "a.com", "nav\nbeta"),
      (3L, "a.com", "nav\ngamma"), (4L, "a.com", "delta"),
      (5L, "b.com", "nav\nepsilon"), (6L, "b.com", "zeta"),
      (7L, "b.com", "eta"), (8L, "b.com", "theta"))
      .toDF("doc_id", "host", "text")
    val got = Dedup.scrubHostBoilerplate(docs, "doc_id", "host", "text",
        minPpm = 500000L, minDf = 2L)
      .orderBy(col("doc_id"))
      .as[(Long, String, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "a.com", "alpha", 2L, 1L), (2L, "a.com", "beta", 2L, 1L),
      (3L, "a.com", "gamma", 2L, 1L), (4L, "a.com", "delta", 1L, 0L),
      (5L, "b.com", "nav\nepsilon", 2L, 0L), (6L, "b.com", "zeta", 1L, 0L),
      (7L, "b.com", "eta", 1L, 0L), (8L, "b.com", "theta", 1L, 0L)))
  }

  test("minDf floor: a 1-doc host never scrubs its own unique lines") {
    // "solo" appears in 1/1 docs of host c (100% of the host) but
    // pdf=1 < minDf=2 keeps it.
    val docs = Seq((1L, "c.com", "solo\nbody")).toDF("doc_id", "host", "text")
    val got = Dedup.scrubHostBoilerplate(docs, "doc_id", "host", "text",
        minPpm = 500000L, minDf = 2L)
      .as[(Long, String, String, Long, Long)].collect().toSeq
    assert(got == Seq((1L, "c.com", "solo\nbody", 2L, 0L)))
  }

  test("fully-scrubbed and all-blank docs surface as empty, not NULL") {
    val docs = Seq(
      (1L, "d.com", "footer"), (2L, "d.com", "footer"),
      (3L, "d.com", "   \n ")).toDF("doc_id", "host", "text")
    val got = Dedup.scrubHostBoilerplate(docs, "doc_id", "host", "text",
        minPpm = 500000L, minDf = 2L)
      .orderBy(col("doc_id"))
      .as[(Long, String, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "d.com", "", 1L, 1L), (2L, "d.com", "", 1L, 1L),
      (3L, "d.com", "", 0L, 0L)))
  }

  test("folded (host, ph) df + host-count partials == one-shot scrub") {
    // the streaming-door contract: doc-disjoint batch partials ADD
    val docs = Seq(
      (1L, "a.com", "nav\nalpha"), (2L, "a.com", "nav\nbeta"),
      (3L, "a.com", "nav\ngamma"), (4L, "a.com", "delta"),
      (5L, "b.com", "nav\nepsilon"), (6L, "b.com", "zeta"))
      .toDF("doc_id", "host", "text")
    val oneShot = Dedup.scrubHostBoilerplate(docs, "doc_id", "host",
        "text", minPpm = 500000L, minDf = 2L)
      .orderBy(col("doc_id")).collect().toSeq
    // fold two doc-disjoint batches
    val batches = Seq(docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1))
    val pdf = batches.map { b =>
      Dedup.hostParagraphDf(
        Dedup.paragraphs(b, "doc_id", "text")
          .join(b.select(col("doc_id"), col("host")), Seq("doc_id")),
        "doc_id", "host")
    }.reduce(_ unionByName _)
      .groupBy(col("host"), col("ph")).agg(sum(col("pdf")).as("pdf"))
    val hn = batches.map(b => Dedup.hostDocCounts(b, "host"))
      .reduce(_ unionByName _)
      .groupBy(col("host")).agg(sum(col("__hn")).as("__hn"))
    val folded = Dedup.scrubHostBoilerplateWith(docs, "doc_id", "host",
        "text", pdf, hn, minPpm = 500000L, minDf = 2L)
      .orderBy(col("doc_id")).collect().toSeq
    assert(folded == oneShot && oneShot.nonEmpty)
  }
}
