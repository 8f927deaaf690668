package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SitemapHopSpec extends SparkSpec {
  import spark.implicits._

  test("parseSitemaps lifts <url> entries; no <loc> drops; no <lastmod> is ''") {
    val maps = Seq(
      ("a.com",
        "<urlset><url><loc>http://a.com/1</loc><lastmod>2026-01-02</lastmod></url>" +
          "<url><loc>http://a.com/2</loc></url>" +
          "<url><lastmod>2026-01-09</lastmod></url></urlset>"),
      ("b.com", "<urlset></urlset>")).toDF("host", "xml")
    val got = WebGraph.parseSitemaps(maps, "host", "xml")
      .as[(String, String, String)].collect().toSet
    assert(got == Set(
      ("a.com", "http://a.com/1", "2026-01-02"),
      ("a.com", "http://a.com/2", "")))
  }

  test("hopDistance: BFS min hops from any seed; unreached is -1") {
    // 1 -> 2 -> 3 -> 4; 5 also -> 3 (seed); 6 isolated.
    val nodes = (1L to 6L).toDF("node")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 3L))
      .toDF("src", "dst")
    val seeds = Seq(1L, 5L).toDF("node")
    val got = WebGraph.hopDistance(nodes, edges, seeds, maxHops = 5)
      .as[(Long, Long)].collect().toMap
    // 3 is reachable in 1 hop from seed 5 even though it is 2 from seed 1
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L,
      5L -> 0L, 6L -> -1L))
  }

  test("hopDistance honors maxHops and short-circuits on exhaustion") {
    val nodes = (1L to 4L).toDF("node")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val capped = WebGraph.hopDistance(nodes, edges, seeds, maxHops = 2)
      .as[(Long, Long)].collect().toMap
    assert(capped == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> -1L))
    // a cycle must settle (anti-join peels visited nodes) and still
    // terminate before maxHops via the empty-frontier check
    val cyc = WebGraph.hopDistance(nodes,
        Seq((1L, 2L), (2L, 1L)).toDF("src", "dst"), seeds, maxHops = 9)
      .as[(Long, Long)].collect().toMap
    assert(cyc == Map(1L -> 0L, 2L -> 1L, 3L -> -1L, 4L -> -1L))
  }

  test("hopDistance duplicate seeds collapse; seed wins over any path") {
    val nodes = (1L to 3L).toDF("node")
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val seeds = Seq(1L, 1L, 3L).toDF("node")
    val got = WebGraph.hopDistance(nodes, edges, seeds, maxHops = 4)
      .as[(Long, Long)].collect().toMap
    // 3 is a seed: dist 0, not the 2-hop path from 1
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 0L))
  }
}
