package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class WebGraphSpec extends SparkSpec {
  import spark.implicits._

  test("links pulls absolute hrefs only, in page order, with repeats") {
    val pages = Seq(
      (1L, """<a href="/">Home</a><a href="http://a.com/p/2">x</a> """ +
        """<a href="https://b.com/p/3">y</a><a href="http://a.com/p/2">x</a>"""),
      (2L, "<p>no links</p>")).toDF("doc_id", "html")
    val got = WebGraph.links(pages, "doc_id", "html")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, "http://a.com/p/2"), (1L, "https://b.com/p/3"),
      (1L, "http://a.com/p/2")))
  }

  test("host parses the authority; unparseable is empty not NULL") {
    val got = Seq("http://d7.example.com/p/9", "https://x.org/", "junk")
      .toDF("url").select(WebGraph.host(col("url")))
      .as[String].collect().toSeq
    assert(got == Seq("d7.example.com", "x.org", ""))
  }

  test("docEdges parses /p/<id> tails, dedups, keeps self-links") {
    val links = Seq(
      (1L, "http://a.com/p/2"), (1L, "http://a.com/p/2"),
      (1L, "http://a.com/p/1"), (2L, "http://a.com/other"),
      (2L, "http://a.com/p/7")).toDF("src", "url")
    val got = WebGraph.docEdges(links).as[(Long, Long)]
      .collect().toSet
    assert(got == Set((1L, 2L), (1L, 1L), (2L, 7L)))
  }

  test("pageRank one round on a hand-computed 3-node graph") {
    // edges: 1->2, 1->3, 2->3; node 3 dangles (no out-edges, fine:
    // only OUT-degree of linking nodes enters the formula).
    val nodes = Seq(1L, 2L, 3L).toDF("node")
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val s = WebGraph.Scale
    val r0 = s / 3
    val base = 15L * s / (100L * 3)
    val exp = Map(
      1L -> base,
      2L -> (base + 85L * (r0 / 2) / 100L),
      3L -> (base + 85L * (r0 / 2 + r0 / 1) / 100L))
    val got = WebGraph.pageRank(nodes, edges, rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(got == exp)
  }

  test("pageRank: in-link hub dominates; every node holds >= base") {
    // star: 1..9 all link to 10; 10 links to 1.
    val nodes = (1L to 10L).toDF("node")
    val edges = ((1L to 9L).map(i => (i, 10L)) :+ ((10L, 1L)))
      .toDF("src", "dst")
    val ranks = WebGraph.pageRank(nodes, edges, rounds = 5)
      .as[(Long, Long)].collect().toMap
    val base = 15L * WebGraph.Scale / (100L * 10)
    assert(ranks(10L) > ranks(1L) && ranks(1L) > ranks(2L))
    assert(ranks.values.forall(_ >= base))
    // mass never exceeds the scale (truncating div only loses)
    assert(ranks.values.sum <= WebGraph.Scale)
  }

  test("anchors pairs each absolute href with its text") {
    val pages = Seq(
      (1L, """<a href="/">Home</a><a href="http://a.com/p/2">two words</a>""" +
        """<a href="https://b.com/x" class="z">empty ok</a>"""))
      .toDF("doc_id", "html")
    val got = WebGraph.anchors(pages, "doc_id", "html")
      .as[(Long, String, String)].collect().toSeq
    assert(got == Seq(
      (1L, "http://a.com/p/2", "two words"),
      (1L, "https://b.com/x", "empty ok")))
  }

  test("canonicalUrl collapses scheme/host case, query, trailing slash") {
    val urls = Seq(
      "https://D7.EXAMPLE.COM/p/9",
      "http://d7.example.com/p/9?utm_source=feed",
      "http://d7.example.com/p/9",
      "http://d7.example.com/p/9#frag",
      "http://other.com/",
      "http://other.com")
    val got = urls.toDF("url")
      .select(WebGraph.canonicalUrl(col("url")))
      .as[String].collect().toSeq
    assert(got.take(4).toSet == Set("http://d7.example.com/p/9"))
    assert(got(4) == "http://other.com" && got(5) == "http://other.com")
  }

  test("canonical edges over messy forms equal the clean edge set") {
    val messy = Seq(
      (1L, """<a href="https://D0.EXAMPLE.COM/p/2">b</a>""" +
        """<a href="http://d0.example.com/p/2?utm_source=x">c</a>""" +
        """<a href="http://d0.example.com/p/3">a</a>"""))
      .toDF("doc_id", "html")
    val canonEdges = WebGraph.docEdges(
      WebGraph.links(messy, "doc_id", "html")
        .select(col("src"), WebGraph.canonicalUrl(col("url")).as("url")))
    assert(canonEdges.as[(Long, Long)].collect().toSet ==
      Set((1L, 2L), (1L, 3L)))
  }

  test("trustRank: non-seeds earn trust only through in-links from trust") {
    // 1 (seed) -> 2 -> 3; 4 is isolated spam with no in-links
    val nodes = (1L to 4L).toDF("node")
    val seeds = Seq(1L).toDF("node")
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 4L)).toDF("src", "dst")
    val t = WebGraph.trustRank(nodes, seeds, edges, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(t(1L) > t(2L) && t(2L) > t(3L) && t(3L) > 0)
    // the self-linking spam node gets residual self-mass from r0=0:
    // zero forever (no teleport, no trusted in-link)
    assert(t(4L) == 0L)
    // hand-check round 1 for node 2: 85% of seed r0 through 1 out-edge
    val s = WebGraph.Scale
    val r1of2 = 85L * (s / 1L) / 100L
    val t1 = WebGraph.trustRank(nodes, seeds, edges, rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(t1(2L) == r1of2)
  }

  test("resolvedLinks: three quote forms, relative resolution, " +
      "fragment/other-scheme drops") {
    val page = "http://d3.example.com/p/30"
    val html =
      """<a href="http://a.com/p/2">dq</a>""" +
        """<a href='http://a.com/p/2?utm_source=x'>sq</a>""" +
        """<a href=http://a.com/p/2#frag>uq</a>""" +
        """<a href="/p/31">root</a>""" +
        """<a href="../p/31">up</a>""" +
        """<a href="./sub/page">dot</a>""" +
        """<a href="//b.org/p/5">proto</a>""" +
        """<a href="mailto:x@y.com">mail</a>""" +
        """<a href="#top">frag</a>"""
    val got = WebGraph.resolvedLinks(
        Seq((30L, page, html)).toDF("doc_id", "url", "html"),
        "doc_id", "url", "html")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq(
      (30L, "http://a.com/p/2"),
      (30L, "http://a.com/p/2?utm_source=x"),
      (30L, "http://a.com/p/2"), // fragment stripped
      (30L, "http://d3.example.com/p/31"), // root-relative
      (30L, "http://d3.example.com/p/31"), // ../ collapsed
      (30L, "http://d3.example.com/p/sub/page"), // ./ collapsed
      (30L, "http://b.org/p/5"))) // page scheme prepended
    // host-only page: base directory is the root
    val got2 = WebGraph.resolvedLinks(
        Seq((1L, "http://h.com", """<a href="x/y">r</a>"""))
          .toDF("doc_id", "url", "html"),
        "doc_id", "url", "html")
      .as[(Long, String)].collect().toSeq
    assert(got2 == Seq((1L, "http://h.com/x/y")))
  }

  test("parseRobots: directives become host-anchored rules; " +
      "comments, groups, sitemaps, empty Disallow all skip") {
    val robots = Seq(
      ("a.com", "User-agent: *\nDisallow: /p\nAllow: /p/ok\n" +
        "Sitemap: http://a.com/map.xml\n# note\nDisallow:\n"),
      ("b.com", "Disallow: /secret"),
      ("c.com", "just prose, no directives")).toDF("host", "txt")
    val got = WebGraph.parseRobots(robots, "host", "txt")
      .as[(String, String)].collect().toSet
    assert(got == Set(
      ("http://a.com/p", "deny"),
      ("http://a.com/p/ok", "allow"),
      ("http://b.com/secret", "deny")))
    // parsed rules drive urlDecisions: the longer Allow carves out
    val dec = WebGraph.urlDecisions(
        Seq("http://a.com/p/1", "http://a.com/p/ok/2",
          "http://a.com/other").toDF("url"),
        WebGraph.parseRobots(robots, "host", "txt"))
      .as[(String, String)].collect().toMap
    assert(dec == Map(
      "http://a.com/p/1" -> "deny",
      "http://a.com/p/ok/2" -> "allow",
      "http://a.com/other" -> "allow"))
  }

  test("urlDecisions: longest prefix wins, default allow, one row per url") {
    val rules = Seq(
      ("http://a.com/", "deny"),
      ("http://a.com/p/", "allow"),
      ("http://a.com/p/private", "deny")).toDF("pattern", "action")
    val urls = Seq(
      "http://a.com/x", "http://a.com/p/1",
      "http://a.com/p/private/2", "http://b.com/",
      "http://a.com/p/1" // duplicate input url
    ).toDF("url")
    val got = WebGraph.urlDecisions(urls, rules)
      .as[(String, String)].collect().toMap
    assert(got == Map(
      "http://a.com/x" -> "deny",
      "http://a.com/p/1" -> "allow",
      "http://a.com/p/private/2" -> "deny",
      "http://b.com/" -> "allow"))
    assert(WebGraph.urlDecisions(urls, rules).count() == 4) // distinct
  }

  test("urlDecisions: conflicting duplicate patterns resolve to allow") {
    // identical pattern, opposite actions — the tie must not depend on
    // rule partition order; 'allow' < 'deny' wins deterministically
    val rules = Seq(
      ("http://a.com/", "deny"),
      ("http://a.com/", "allow")).toDF("pattern", "action")
    val urls = Seq("http://a.com/x").toDF("url")
    (1 to 3).foreach { _ =>
      val got = WebGraph.urlDecisions(urls, rules.repartition(4))
        .as[(String, String)].collect().toSeq
      assert(got == Seq(("http://a.com/x", "allow")))
    }
  }

  test("pageRankCtes replays pageRank bit-identically (spark.sql)") {
    val nodes = (1L to 6L).toDF("node")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L), (5L, 1L),
      (6L, 6L)).toDF("src", "dst")
    nodes.createOrReplaceTempView("wg_nodes_v")
    edges.createOrReplaceTempView("wg_edges_v")
    // Spark accepts the same CTE text modulo `//` -> `div`
    val sql = "WITH " +
      WebGraph.pageRankCtes("wg_nodes_v", "node", "wg_edges_v", 3)
        .replace("//", "div") +
      " SELECT node, rank FROM wgr3 ORDER BY node"
    val viaSql = spark.sql(sql).as[(Long, Long)].collect().toSeq
    val viaApi = WebGraph.pageRank(nodes, edges, rounds = 3)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(viaSql == viaApi)
  }

  test("urlDecisions is scheme-agnostic: https cannot bypass a deny") {
    val rules = Seq(("http://a.com/secret", "deny"),
      ("a.com/p/", "allow")).toDF("pattern", "action")
    val got = WebGraph.urlDecisions(Seq(
        "https://a.com/secret/1", // https vs http rule: still denied
        "http://a.com/secret/2",
        "https://a.com/p/3" // scheme-less rule form matches too
      ).toDF("url"), rules)
      .as[(String, String)].collect().toMap
    assert(got == Map(
      "https://a.com/secret/1" -> "deny",
      "http://a.com/secret/2" -> "deny",
      "https://a.com/p/3" -> "allow"))
  }

  test("resolvedLinksBase: base overrides relative resolution only " +
      "where it differs from the page") {
    val page = "http://h.com/s/p/1"
    def pages(html: String) =
      Seq((1L, page, html)).toDF("doc_id", "url", "html")
    def got(html: String) =
      WebGraph.resolvedLinksBase(pages(html), "doc_id", "url", "html")
        .as[(Long, String)].collect().toSeq.map(_._2)
    val hrefs = """<a href="q/p/2">r</a><a href="/p/3">root</a>""" +
      """<a href="http://x.org/p/4">abs</a>"""
    // no base: identical to resolvedLinks
    assert(got(hrefs) ==
      Seq("http://h.com/s/p/q/p/2", "http://h.com/p/3",
        "http://x.org/p/4"))
    // relative base ../ : resolved against the page, then links
    // against it — the relative href moves one directory up
    assert(got(s"""<base href="../">$hrefs""") ==
      Seq("http://h.com/s/q/p/2", "http://h.com/p/3",
        "http://x.org/p/4"))
    // absolute cross-host base: relative AND root-relative hrefs
    // leave the page's host; absolute hrefs don't
    assert(got(s"""<base href="http://cdn.net/lib/">$hrefs""") ==
      Seq("http://cdn.net/lib/q/p/2", "http://cdn.net/p/3",
        "http://x.org/p/4"))
    // root-relative single-quoted base
    assert(got(s"<base href='/b/'>" + hrefs) ==
      Seq("http://h.com/b/q/p/2", "http://h.com/p/3",
        "http://x.org/p/4"))
    // unresolvable base falls back to the page URL
    assert(got(s"""<base href="mailto:x@y.z">$hrefs""") ==
      Seq("http://h.com/s/p/q/p/2", "http://h.com/p/3",
        "http://x.org/p/4"))
    // first base wins
    assert(got(s"""<base href="/b/"><base href="/c/">""" +
        """<a href="q">r</a>""") ==
      Seq("http://h.com/b/q"))
  }

  test("parseRobotsFor selects the agent's group, falls back to *, " +
      "and crawlDelays follows the same selection") {
    val robots = Seq(
      // two groups: a graftbot-specific one and a shared */otherbot
      // one (two UA lines in one group)
      ("a.com", "User-agent: GraftBot\nDisallow: /p/1\nCrawl-delay: 2\n" +
        "\nUser-agent: *\nUser-agent: otherbot\nDisallow: /p/2\n" +
        "Crawl-delay: 10\n# note"),
      // star group only
      ("b.com", "User-agent: *\nDisallow: /q\nCrawl-delay: 7"),
      // rules before any group header: no group, dropped
      ("c.com", "Disallow: /loose\nUser-agent: *\nAllow: /ok\n" +
        "Disallow: /no")).toDF("host", "txt")
    def rules(agent: String) =
      WebGraph.parseRobotsFor(robots, "host", "txt", agent)
        .as[(String, String)].collect().toSet
    // exact group wins on a.com (case-insensitive); * elsewhere
    assert(rules("graftbot") == Set(
      ("a.com/p/1", "deny"), ("b.com/q", "deny"),
      ("c.com/ok", "allow"), ("c.com/no", "deny")))
    // unknown agent: * group everywhere
    assert(rules("crawlzilla") == Set(
      ("a.com/p/2", "deny"), ("b.com/q", "deny"),
      ("c.com/ok", "allow"), ("c.com/no", "deny")))
    val d1 = WebGraph.crawlDelays(robots, "host", "txt", "graftbot")
      .as[(String, Long)].collect().toMap
    assert(d1 == Map("a.com" -> 2L, "b.com" -> 7L)) // c.com: none
    val d2 = WebGraph.crawlDelays(robots, "host", "txt", "crawlzilla")
      .as[(String, Long)].collect().toMap
    assert(d2 == Map("a.com" -> 10L, "b.com" -> 7L))
  }

  test("sitemapDirectives lifts Sitemap: lines; rules/comments skip") {
    val robots = Seq(
      ("a.com", "User-agent: *\nDisallow: /p\n" +
        "Sitemap: http://a.com/sm/root.xml\n" +
        "sitemap: https://a.com/sm/extra.xml\n# note"),
      ("b.com", "User-agent: *\nAllow: /ok"),
      ("c.com", "Sitemap: not-a-url")).toDF("host", "txt")
    val got = WebGraph.sitemapDirectives(robots, "host", "txt")
      .as[(String, String)].collect().toSet
    assert(got == Set(
      ("a.com", "http://a.com/sm/root.xml"),
      ("a.com", "https://a.com/sm/extra.xml")))
  }

  test("parseSitemapIndex + parseSitemapsNested: one nesting level, " +
      "unfetched children contribute nothing") {
    val roots = Seq(
      ("a.com", "<sitemapindex>" +
        "<sitemap><loc>http://a.com/sm/0.xml</loc></sitemap>" +
        "<sitemap><loc>http://a.com/sm/1.xml</loc></sitemap>" +
        "<sitemap><loc>http://a.com/sm/missing.xml</loc></sitemap>" +
        "</sitemapindex>"),
      ("b.com", "<urlset><url><loc>http://b.com/p/9</loc>" +
        "<lastmod>2026-02-02</lastmod></url></urlset>"))
      .toDF("host", "xml")
    val fetched = Seq(
      ("http://a.com/sm/0.xml", "<urlset><url><loc>http://a.com/p/1" +
        "</loc><lastmod>2026-01-01</lastmod></url></urlset>"),
      ("http://a.com/sm/1.xml", "<urlset><url><loc>http://a.com/p/2" +
        "</loc></url></urlset>")).toDF("url", "xml")
    val idx = WebGraph.parseSitemapIndex(roots, "host", "xml")
      .as[(String, String)].collect().toSet
    assert(idx == Set(
      ("a.com", "http://a.com/sm/0.xml"),
      ("a.com", "http://a.com/sm/1.xml"),
      ("a.com", "http://a.com/sm/missing.xml")))
    val got = WebGraph.parseSitemapsNested(roots, "host", "xml",
        fetched, "url", "xml")
      .as[(String, String, String)].collect().toSet
    assert(got == Set(
      ("b.com", "http://b.com/p/9", "2026-02-02"), // direct urlset
      ("a.com", "http://a.com/p/1", "2026-01-01"), // via child 0
      ("a.com", "http://a.com/p/2", ""))) // via child 1, no lastmod
  }

  test("urlDecisions wildcards: * runs, trailing $ anchors, literal " +
      "metachars stay literal, precedence by stripped pattern length") {
    val rules = Seq(
      ("a.com/p/", "deny"), // len 9
      ("a.com/p/*.html", "allow"), // len 14: carve-out inside the deny
      ("a.com/*.php$", "deny"), // len 12: anchored extension rule
      ("a.com/p/1", "allow") // len 9 prefix — loses to the $ rule
    ).toDF("pattern", "action")
    val urls = Seq(
      "http://a.com/p/7.html", // *.html allow (14) beats /p/ deny (9)
      "http://a.com/p/1.php", // *.php$ deny (12) beats /p/1 allow (9)
      "http://a.com/p/5.php.txt", // $ anchor: .php NOT at end -> /p/ deny
      "https://a.com/x.php", // scheme-agnostic wildcard match
      "http://a.com/q/2" // nothing matches -> default allow
    ).toDF("url")
    val got = WebGraph.urlDecisions(urls, rules)
      .as[(String, String)].collect().toMap
    assert(got == Map(
      "http://a.com/p/7.html" -> "allow",
      "http://a.com/p/1.php" -> "deny",
      "http://a.com/p/5.php.txt" -> "deny",
      "https://a.com/x.php" -> "deny",
      "http://a.com/q/2" -> "allow"))
    // the '.' in a pattern is literal, never a regex dot: 'a.com' must
    // not match 'aXcom' even through the wildcard-regex path
    val lit = WebGraph.urlDecisions(
        Seq("http://aXcom/p/1.php").toDF("url"),
        Seq(("a.com/*.php$", "deny")).toDF("pattern", "action"))
      .as[(String, String)].collect().toMap
    assert(lit == Map("http://aXcom/p/1.php" -> "allow"))
  }

  test("urlDecisions precedence strips the scheme bonus: a scheme-full " +
      "short rule cannot beat a scheme-less deeper rule") {
    // raw lengths: 'http://a.com/x' (14) > 'a.com/x/deep' (12) — but
    // effective prefixes are 'a.com/x' (7) < 'a.com/x/deep' (12)
    val rules = Seq(
      ("http://a.com/x", "deny"),
      ("a.com/x/deep", "allow")).toDF("pattern", "action")
    val got = WebGraph.urlDecisions(
        Seq("http://a.com/x/deep/1").toDF("url"), rules)
      .as[(String, String)].collect().toMap
    assert(got == Map("http://a.com/x/deep/1" -> "allow"))
  }

  test("robots field names are case-insensitive (RFC 9309): DISALLOW, " +
      "Crawl-Delay, SITEMAP all parse") {
    val robots = Seq(("a.com",
      "User-Agent: *\nDISALLOW: /p/\nallow: /p/ok\n" +
        "Crawl-Delay: 7\nSITEMAP: http://a.com/sm.xml"))
      .toDF("host", "txt")
    val rules = WebGraph.parseRobotsFor(robots, "host", "txt", "anybot")
      .as[(String, String)].collect().toSet
    assert(rules == Set(("a.com/p/", "deny"), ("a.com/p/ok", "allow")))
    val delays = WebGraph.crawlDelays(robots, "host", "txt", "anybot")
      .as[(String, Long)].collect().toSeq
    assert(delays == Seq(("a.com", 7L)))
    val sm = WebGraph.sitemapDirectives(robots, "host", "txt")
      .as[(String, String)].collect().toSeq
    assert(sm == Seq(("a.com", "http://a.com/sm.xml")))
    // the flat parser folds case too
    val flat = WebGraph.parseRobots(robots, "host", "txt")
      .as[(String, String)].collect().toSet
    assert(flat == Set(("http://a.com/p/", "deny"),
      ("http://a.com/p/ok", "allow")))
  }

  test("resolveRedirects collapses chains, drops cycles and " +
      "over-budget chains — never resolves to a redirect source") {
    val redirects = Seq(
      ("a", "b"), // a -> b (b not a source: depth-1 resolve)
      ("c", "a"), // c -> a -> b (depth 2)
      ("d", "c"), // d -> c -> a -> b (depth 3)
      ("e", "d"), // e -> ... -> b (depth 4, at the budget)
      ("f", "e"), // f needs 5 hops -> DROPS at maxHops=4
      ("x", "y"), ("y", "x") // 2-cycle -> both DROP
    ).toDF("url", "location")
    val got = WebGraph.resolveRedirects(redirects, maxHops = 4)
      .as[(String, String)].collect().toMap
    assert(got == Map("a" -> "b", "c" -> "b", "d" -> "b", "e" -> "b"))
    // CTE replay agrees bit-for-bit (spark.sql accepts the same text)
    redirects.createOrReplaceTempView("wg_redir_v")
    val viaSql = spark.sql("WITH " +
        WebGraph.resolveRedirectsCtes("wg_redir_v", "url", "location", 4) +
        " SELECT url, final_url FROM rrres")
      .as[(String, String)].collect().toMap
    assert(viaSql == got)
  }

  test("canonicalLinks: both attribute orders, quote forms, relative " +
      "resolution, first-wins, and non-declaring pages absent") {
    val pages = Seq(
      // rel-first, absolute
      (1L, "http://a.com/p/1?ref=x",
        """<html><link rel="canonical" href="http://a.com/p/1"><p>x</p>"""),
      // href-first, root-relative resolves against the page origin
      (2L, "http://b.com/dir/page",
        """<link href='/p/2' rel='canonical'><a href="/q">q</a>"""),
      // unquoted + relative resolves against the page directory
      (3L, "http://c.com/dir/page",
        "<link rel=canonical href=other>"),
      // two declarations: the FIRST wins (the <base> rule)
      (4L, "http://d.com/x",
        """<link rel="canonical" href="http://d.com/first">""" +
          """<link rel="canonical" href="http://d.com/second">"""),
      // no canonical at all -> no row
      (5L, "http://e.com/x", "<html><a href='/y'>y</a></html>")
    ).toDF("doc_id", "url", "html")
    val got = WebGraph.canonicalLinks(pages, "doc_id", "url", "html")
      .as[(Long, String)].collect().toMap
    assert(got == Map(
      1L -> "http://a.com/p/1",
      2L -> "http://b.com/p/2",
      3L -> "http://c.com/dir/other",
      4L -> "http://d.com/first"))
    // cross-engine equivalence of canonicalLinksCtes is the q263
    // oracle gate (regexp_matches is DuckDB-only — not replayable here)
  }
}
