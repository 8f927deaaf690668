package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalGraphSpec extends SparkSpec {
  import spark.implicits._

  private def page(id: Long, targets: Long*): (Long, String) =
    (id, targets.map(t =>
      s"""<a href="http://d${t % 20}.example.com/p/$t">r</a>""")
      .mkString("<html><body>", " ", "</body></html>"))

  private val pages = Seq(
    page(1L, 2L, 3L), page(2L, 3L), page(3L, 1L, 1L),
    page(4L, 4L), page(5L)).toDF("doc_id", "html")

  test("any batching equals the one-shot edge set") {
    val oneShot = WebGraph.docEdges(
        WebGraph.links(pages, "doc_id", "html"))
      .as[(Long, Long)].collect().toSet
    for (m <- Seq(2, 3)) {
      var idx = IncrementalGraph.build(
        pages.filter(col("doc_id") % m === 0), "doc_id", "html")
      (1 until m).foreach { k =>
        idx = IncrementalGraph.addBatch(idx,
          pages.filter(col("doc_id") % m === k), "doc_id", "html")
      }
      assert(idx.edges.as[(Long, Long)].collect().toSet == oneShot,
        s"batching mod $m diverged")
    }
  }

  test("delete removes out-edges only; in-edges survive as dangling") {
    val idx = IncrementalGraph.build(pages, "doc_id", "html")
    val after = IncrementalGraph.delete(idx,
      Seq(3L).toDF("doc_id"), "doc_id")
    val got = after.edges.as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L), (4L, 4L)))
  }

  test("save/load roundtrip through the catalog") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-igraph").toString
    val cat = new graft.catalog.ParquetCatalog(spark, root)
    val idx = IncrementalGraph.build(pages, "doc_id", "html")
    IncrementalGraph.save(idx, cat, "g")
    val loaded = IncrementalGraph.load(cat, "g")
    assert(loaded.edges.as[(Long, Long)].collect().toSet ==
      idx.edges.as[(Long, Long)].collect().toSet)
    graft.queries.Round7bQueries.rmTree(root)
  }

  test("rank over accumulated graph equals one-shot pageRank") {
    val nodes = (1L to 5L).toDF("node")
    var idx = IncrementalGraph.build(
      pages.filter(col("doc_id") <= 2), "doc_id", "html")
    idx = IncrementalGraph.addBatch(idx,
      pages.filter(col("doc_id") > 2), "doc_id", "html")
    val inc = IncrementalGraph.rank(idx, nodes, 3)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    val one = WebGraph.pageRank(nodes,
        WebGraph.docEdges(WebGraph.links(pages, "doc_id", "html")), 3)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(inc == one)
  }
}
