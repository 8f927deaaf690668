package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Arbitrary-depth sitemap trees: multi-level expansion, the cycle
  * guard (a back-edge expands once), unfetched children, and the loud
  * depth bound.
  */
class SitemapTreeSpec extends SparkSpec {
  import spark.implicits._

  private def leaf(urls: Seq[String]): String =
    urls.map(u => s"<url><loc>$u</loc><lastmod>2025-01-01</lastmod></url>")
      .mkString

  private def index(children: Seq[String]): String =
    children.map(c => s"<sitemap><loc>$c</loc></sitemap>").mkString

  test("three levels + cycle back-edge + unfetched child: every leaf " +
      "URL exactly once") {
    val roots = Seq(("h1", index(Seq("sm/a0", "sm/a1")))).toDF("host", "xml")
    val fetched = Seq(
      ("sm/a0", leaf(Seq("p/1", "p/2"))),
      ("sm/a1", index(Seq("sm/b0", "sm/b1"))),
      ("sm/b0", leaf(Seq("p/3"))),
      // b1: third level + CYCLE back to a1 + a never-fetched child
      ("sm/b1", index(Seq("sm/c0", "sm/a1", "sm/missing"))),
      ("sm/c0", leaf(Seq("p/4", "p/5")))).toDF("url", "xml")
    val inv = WebGraph.parseSitemapsRecursive(roots, "host", "xml",
      fetched, "url", "xml", maxDepth = 8)
    val urls = inv.select(col("url")).as[String].collect().sorted.toSeq
    assert(urls == Seq("p/1", "p/2", "p/3", "p/4", "p/5"))
    assert(inv.select(col("host")).distinct().as[String]
      .collect().toSeq == Seq("h1"))
  }

  test("a tree deeper than maxDepth fails loudly instead of dropping " +
      "shards") {
    val roots = Seq(("h1", index(Seq("s1")))).toDF("host", "xml")
    val fetched = Seq(
      ("s1", index(Seq("s2"))),
      ("s2", index(Seq("s3"))),
      ("s3", leaf(Seq("p/1")))).toDF("url", "xml")
    intercept[IllegalArgumentException] {
      WebGraph.parseSitemapsRecursive(roots, "host", "xml",
        fetched, "url", "xml", maxDepth = 2).count()
    }
    // at sufficient depth the same tree resolves
    val ok = WebGraph.parseSitemapsRecursive(roots, "host", "xml",
      fetched, "url", "xml", maxDepth = 3)
    assert(ok.select(col("url")).as[String].collect().toSeq ==
      Seq("p/1"))
  }

  test("a pure cycle terminates idempotently (each pair expands once)") {
    val roots = Seq(("h1", index(Seq("sx")))).toDF("host", "xml")
    val fetched = Seq(
      ("sx", leaf(Seq("p/1")) + index(Seq("sy"))),
      ("sy", leaf(Seq("p/2")) + index(Seq("sx")))).toDF("url", "xml")
    val inv = WebGraph.parseSitemapsRecursive(roots, "host", "xml",
      fetched, "url", "xml", maxDepth = 8)
    assert(inv.select(col("url")).as[String].collect().sorted.toSeq ==
      Seq("p/1", "p/2"))
  }

  test("two hosts sharing child URLs expand independently (visited " +
      "is per (host, child))") {
    val roots = Seq(("h1", index(Seq("shared"))),
      ("h2", index(Seq("shared")))).toDF("host", "xml")
    val fetched = Seq(("shared", leaf(Seq("p/9")))).toDF("url", "xml")
    val inv = WebGraph.parseSitemapsRecursive(roots, "host", "xml",
      fetched, "url", "xml", maxDepth = 2)
    assert(inv.select(col("host"), col("url")).as[(String, String)]
      .collect().sorted.toSeq ==
      Seq(("h1", "p/9"), ("h2", "p/9")))
  }
}
