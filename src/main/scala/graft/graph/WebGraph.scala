package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-graph analytics over a crawled markup corpus: link extraction,
  * domain-level adjacency, and an exact-integer PageRank — the quality
  * signal real crawl pipelines (CC-style) attach to every document via
  * its host. The reference's staging-feed role (SCD_script.txt:83-116)
  * generalized to the graph a crawl actually ships with.
  *
  * Everything is DuckDB-replayable: link extraction is one
  * `regexp_extract_all` in the shared RE2 subset; PageRank mass is a
  * scaled nonnegative integer and EVERY division is SQL `div` (==
  * DuckDB `//` on nonnegative operands), so k rounds replay
  * bit-identically as k unrolled CTEs.
  *
  * Scale: extraction is per-document (one scan, no shuffle); each
  * PageRank round is one edge-keyed join + one target-keyed
  * aggregation — the canonical distributed formulation. The loop
  * `localCheckpoint`s every round (growing-lineage invariant), and
  * rank state is 16 bytes/node — 1000-executor-sized at billions of
  * nodes. Nothing driver-side except the node count.
  */
object WebGraph {

  /** Absolute http(s) hrefs of each page: `(src, url)` — one row per
    * anchor occurrence (duplicates preserved; callers dedup when their
    * semantics need it). Relative links (nav/footer boilerplate) carry
    * no cross-host signal and are excluded by the pattern itself.
    */
  def links(pages: DataFrame, idCol: String, htmlCol: String): DataFrame =
    pages.select(col(idCol).as("src"),
      explode(expr(
        s"""regexp_extract_all($htmlCol, 'href="(https?://[^"]+)"', 1)"""))
        .as("url"))

  /** DuckDB body for [[links]] over `rel(idCol, htmlCol)`. */
  def linksSql(rel: String, idCol: String, htmlCol: String): String =
    s"""SELECT $idCol AS src, unnest(regexp_extract_all($htmlCol, 'href="(https?://[^"]+)"', 1)) AS url FROM $rel"""

  /** Absolute-href anchor ELEMENTS with their text: `(src, url,
    * anchor)` — the in-link description of the TARGET page, the IR
    * signal link-based document representations aggregate (anchor text
    * describes the page it points AT, often better than the page
    * itself does). Same per-page shape as [[links]].
    */
  def anchors(pages: DataFrame, idCol: String, htmlCol: String)
      : DataFrame =
    pages.select(col(idCol).as("src"),
      explode(expr(
        s"""regexp_extract_all($htmlCol, '<a href="https?://[^"]*"[^>]*>[^<]*</a>', 0)"""))
        .as("__e"))
      .select(col("src"),
        regexp_extract(col("__e"), "href=\"([^\"]+)\"", 1).as("url"),
        regexp_extract(col("__e"), ">([^<]*)<", 1).as("anchor"))

  /** DuckDB body for [[anchors]] over `rel(idCol, htmlCol)`. */
  def anchorsSql(rel: String, idCol: String, htmlCol: String): String =
    s"""SELECT src, regexp_extract(e, 'href="([^"]+)"', 1) AS url, regexp_extract(e, '>([^<]*)<', 1) AS anchor FROM (SELECT $idCol AS src, unnest(regexp_extract_all($htmlCol, '<a href="https?://[^"]*"[^>]*>[^<]*</a>', 0)) AS e FROM $rel) t"""

  /** Canonical URL identity: scheme collapsed to http, host
    * lowercased, query/fragment (tracking params) dropped, trailing
    * slash stripped — the normalization a crawl dedups fetch targets
    * under. Pure regex in the shared RE2 subset.
    */
  def canonicalUrl(url: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    concat(lit("http://"),
      lower(regexp_extract(url, "^https?://([^/?#]+)", 1)),
      regexp_replace(
        regexp_extract(url, "^https?://[^/?#]+([^?#]*)", 1), "/$", ""))

  /** DuckDB SQL text computing exactly [[canonicalUrl]]. */
  def canonicalUrlSql(expr: String): String =
    s"""('http://' || lower(regexp_extract($expr, '^https?://([^/?#]+)', 1)) || regexp_replace(regexp_extract($expr, '^https?://[^/?#]+([^?#]*)', 1), '/$$', ''))"""

  /** Host component of an URL column (empty string when unparseable —
    * loud enough to count, never NULL).
    */
  def host(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_extract(url, "^https?://([^/]+)", 1)

  def hostSql(expr: String): String =
    s"regexp_extract($expr, '^https?://([^/]+)', 1)"

  /** Distinct doc→doc edges from a `(src, url)` link relation whose
    * URLs carry the target id as a `/p/<id>` path tail (the corpus URL
    * scheme). Unresolvable URLs drop; self-links are kept so every
    * linking page keeps out-degree ≥ 1 (no dangling mass).
    */
  def docEdges(linkRel: DataFrame): DataFrame =
    linkRel
      .select(col("src"),
        regexp_extract(col("url"), "/p/([0-9]+)$", 1).as("__t"))
      .filter(col("__t") =!= "")
      .select(col("src"), col("__t").cast("long").as("dst"))
      .distinct()

  def docEdgesSql(linkRel: String): String =
    s"""SELECT DISTINCT src, CAST(regexp_extract(url, '/p/([0-9]+)$$', 1) AS BIGINT) AS dst FROM $linkRel WHERE regexp_extract(url, '/p/([0-9]+)$$', 1) <> ''"""

  /** RESOLVED links — the realistic extraction [[links]]' absolute-
    * double-quoted pattern under-covers: href values in all three
    * attribute quote forms (double, single, unquoted), resolved
    * against the PAGE's own URL the way a browser does —
    *
    *   - absolute `http(s)://…`      → kept as-is
    *   - protocol-relative `//host…` → page scheme prepended
    *   - root-relative `/path`       → page origin prepended
    *   - other relative `path`       → page base directory prepended,
    *     then `./` and up to four levels of `seg/../` collapsed
    *   - fragments stripped; other schemes (`mailto:` …) and
    *     fragment-only values drop as NULL
    *
    * Returns `(src, url)` rows with NULLs dropped — the majority of
    * real crawl edges are relative, and excluding them (as [[links]]
    * does for its boilerplate-skip semantics) under-counts every
    * host-local graph. Per-page work only: one extract + a chain of
    * codegen'd string ops, no shuffle.
    *
    * Cross-engine note: Spark's `regexp_replace` replaces every
    * non-overlapping occurrence per pass while DuckDB's replaces one,
    * so each collapse step is written as ONE bounded rewrite per
    * nesting level on both sides — after four passes both engines sit
    * at the same fixed point for any sane nesting depth.
    */
  def resolvedLinks(pages: DataFrame, idCol: String, urlCol: String,
      htmlCol: String): DataFrame = {
    val raw = pages.select(col(idCol).as("src"),
      col(urlCol).as("__page"),
      explode(expr(s"""regexp_extract_all($htmlCol, 'href=("[^"]*"|\\'[^\\']*\\'|[^ >"\\']+)', 1)"""))
        .as("__href"))
    raw.select(col("src"),
        resolveUrl(col("__page"), col("__href")).as("url"))
      .filter(col("url").isNotNull)
  }

  /** One href value resolved against its page URL (see
    * [[resolvedLinks]]). `href` may still carry its surrounding
    * quotes.
    */
  def resolveUrl(page: org.apache.spark.sql.Column,
      href: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    // two single-match strips (NOT one alternation: DuckDB's
    // single-replace twin would drop only the leading quote)
    val unq = regexp_replace(regexp_replace(href, "^[\"']", ""),
      "[\"']$", "")
    val v = regexp_replace(unq, "#.*$", "")
    val origin = regexp_extract(page, "^(https?://[^/?#]+)", 1)
    val scheme = regexp_extract(page, "^(https?:)", 1)
    val p0 = regexp_extract(page, "^[^?#]*", 0)
    val base = when(p0.rlike("^https?://[^/]+$"), concat(p0, lit("/")))
      .otherwise(regexp_replace(p0, "[^/]*$", ""))
    val abs = when(v.rlike("^https?://"), v)
      .when(v.startsWith("//"), concat(scheme, v))
      .when(v.startsWith("/"), concat(origin, v))
      .when(v === "" || v.rlike("^[A-Za-z][A-Za-z0-9+.-]*:"), lit(null))
      .otherwise(concat(base, v))
    (1 to 4).foldLeft(abs)((c, _) =>
      regexp_replace(regexp_replace(c, "/\\./", "/"),
        "/[^/]+/\\.\\./", "/"))
  }

  /** DuckDB CTE chain for [[resolvedLinks]] over
    * `rel(idCol, urlCol, htmlCol)`, ending in `rlinks<sfx>(src, url)`.
    */
  def resolvedLinksCtes(rel: String, idCol: String, urlCol: String,
      htmlCol: String, sfx: String = ""): String = {
    val collapse = (1 to 4).foldLeft("abs_url") { (x, _) =>
      s"regexp_replace(regexp_replace($x, '/\\./', '/'), '/[^/]+/\\.\\./', '/')"
    }
    s"""rraw$sfx AS (SELECT $idCol AS src, $urlCol AS page,
       |    regexp_replace(regexp_replace(unnest(
       |      regexp_extract_all($htmlCol, 'href=("[^"]*"|''[^'']*''|[^ >"'']+)', 1)),
       |      '^["'']', ''), '["'']$$', '') AS unq
       |  FROM $rel),
       |rval$sfx AS (SELECT src, page,
       |    regexp_replace(unq, '#.*$$', '') AS v,
       |    regexp_extract(page, '^(https?://[^/?#]+)', 1) AS origin,
       |    regexp_extract(page, '^(https?:)', 1) AS scheme,
       |    regexp_extract(page, '^[^?#]*', 0) AS p0
       |  FROM rraw$sfx),
       |rabs$sfx AS (SELECT src,
       |    CASE WHEN regexp_matches(v, '^https?://') THEN v
       |         WHEN v LIKE '//%' THEN scheme || v
       |         WHEN v LIKE '/%' THEN origin || v
       |         WHEN v = '' OR regexp_matches(v, '^[A-Za-z][A-Za-z0-9+.-]*:') THEN NULL
       |         ELSE (CASE WHEN regexp_matches(p0, '^https?://[^/]+$$')
       |                 THEN p0 || '/'
       |                 ELSE regexp_replace(p0, '[^/]*$$', '') END) || v
       |    END AS abs_url
       |  FROM rval$sfx),
       |rlinks$sfx AS (SELECT src, $collapse AS url FROM rabs$sfx
       |  WHERE abs_url IS NOT NULL)""".stripMargin
  }

  /** [[resolvedLinks]] under `<base href>` — the document-level
    * resolution override [[resolvedLinks]] ignores: when a page sets a
    * base element, RELATIVE hrefs resolve against the BASE URL (itself
    * first resolved against the page URL, since a base may be
    * relative), not against the page — root-relative links then take
    * the base's ORIGIN (a cross-host `<base>` redirects them off-site,
    * the behavior a browser shows and scheme-blind extraction gets
    * wrong). Absolute and protocol-relative hrefs are unaffected, as
    * in a browser. The first base element wins (HTML's rule); all
    * three attribute quote forms are accepted; an unresolvable base
    * (`mailto:`…) falls back to the page URL. Same per-page,
    * shuffle-free shape as [[resolvedLinks]].
    */
  def resolvedLinksBase(pages: DataFrame, idCol: String, urlCol: String,
      htmlCol: String): DataFrame = {
    val b = regexp_extract(col(htmlCol),
      "<base href=(\"[^\"]*\"|'[^']*'|[^ >\"']+)", 1)
    val eff = when(b === "", col(urlCol))
      .otherwise(coalesce(resolveUrl(col(urlCol), b), col(urlCol)))
    // the href extraction is attribute-blind — strip base ELEMENTS so
    // the base's own href is not emitted as a link
    val nb = regexp_replace(col(htmlCol),
      "<base href=(\"[^\"]*\"|'[^']*'|[^ >\"']+)[^>]*>", "")
    resolvedLinks(pages.withColumn("__effpage", eff)
      .withColumn("__htmlnb", nb), idCol, "__effpage", "__htmlnb")
  }

  /** DuckDB CTE chain for [[resolvedLinksBase]] over
    * `rel(idCol, urlCol, htmlCol)`, ending in `rlinks<sfx>(src, url)`
    * (the [[resolvedLinksCtes]] contract — the base stages are
    * prefixed `rb*<sfx>`).
    */
  def resolvedLinksBaseCtes(rel: String, idCol: String, urlCol: String,
      htmlCol: String, sfx: String = ""): String = {
    val collapse = (1 to 4).foldLeft("rb_abs") { (x, _) =>
      s"regexp_replace(regexp_replace($x, '/\\./', '/'), '/[^/]+/\\.\\./', '/')"
    }
    s"""rb0$sfx AS (SELECT $idCol AS rb_id, $urlCol AS rb_page,
       |    $htmlCol AS rb_html,
       |    regexp_replace(regexp_replace(
       |      regexp_extract($htmlCol, '<base href=("[^"]*"|''[^'']*''|[^ >"'']+)', 1),
       |      '^["'']', ''), '["'']$$', '') AS rb_bq
       |  FROM $rel),
       |rb1$sfx AS (SELECT rb_id, rb_page, rb_html,
       |    regexp_replace(rb_bq, '#.*$$', '') AS v,
       |    regexp_extract(rb_page, '^(https?://[^/?#]+)', 1) AS origin,
       |    regexp_extract(rb_page, '^(https?:)', 1) AS scheme,
       |    regexp_extract(rb_page, '^[^?#]*', 0) AS p0
       |  FROM rb0$sfx),
       |rb2$sfx AS (SELECT rb_id, rb_page, rb_html,
       |    CASE WHEN regexp_matches(v, '^https?://') THEN v
       |         WHEN v LIKE '//%' THEN scheme || v
       |         WHEN v LIKE '/%' THEN origin || v
       |         WHEN v = '' OR regexp_matches(v, '^[A-Za-z][A-Za-z0-9+.-]*:') THEN NULL
       |         ELSE (CASE WHEN regexp_matches(p0, '^https?://[^/]+$$')
       |                 THEN p0 || '/'
       |                 ELSE regexp_replace(p0, '[^/]*$$', '') END) || v
       |    END AS rb_abs
       |  FROM rb1$sfx),
       |rbeff$sfx AS (SELECT rb_id,
       |    COALESCE($collapse, rb_page) AS effpage,
       |    regexp_replace(rb_html, '<base href=("[^"]*"|''[^'']*''|[^ >"'']+)[^>]*>', '', 'g') AS html
       |  FROM rb2$sfx),
       |${resolvedLinksCtes(s"rbeff$sfx", "rb_id", "effpage", "html", sfx)}""".stripMargin
  }

  /** `rel=canonical` declarations: `(src, canonical)` — one row per
    * page that declares a canonical URL, the href resolved against
    * the page URL like any link. Both attribute orders are accepted
    * (`rel` first or `href` first, all three quote forms). Precedence:
    * the rel-first FORM wins over the href-first form regardless of
    * document position, then first match within each form
    * (regexp_extract takes the first match on both engines) — NOT a
    * pure document-order rule; a later rel-first declaration beats an
    * earlier href-first one. Duplicate-content mirrors
    * (`?ref=` tracking copies, host aliases) declare the same target,
    * so grouping on `canonical` is a publisher-declared dedup key —
    * the relation feeds exact-dup folding the way [[resolveRedirects]]
    * feeds the frontier. Per-page codegen string work, no shuffle.
    */
  def canonicalLinks(pages: DataFrame, idCol: String, urlCol: String,
      htmlCol: String): DataFrame = {
    val relFirst = regexp_extract(col(htmlCol),
      "<link[^>]*rel=[\"']?canonical[\"']?[^>]*href=(\"[^\"]*\"|'[^']*'|[^ >\"']+)",
      1)
    val hrefFirst = regexp_extract(col(htmlCol),
      "<link[^>]*href=(\"[^\"]*\"|'[^']*'|[^ >\"']+)[^>]*rel=[\"']?canonical[\"']?",
      1)
    val cq = when(relFirst =!= "", relFirst).otherwise(hrefFirst)
    pages.select(col(idCol).as("src"), col(urlCol).as("__page"),
        cq.as("__href"))
      .filter(col("__href") =!= "")
      .select(col("src"),
        resolveUrl(col("__page"), col("__href")).as("canonical"))
      .filter(col("canonical").isNotNull)
  }

  /** DuckDB CTE chain for [[canonicalLinks]] over
    * `rel(idCol, urlCol, htmlCol)`, ending in
    * `cn<sfx>(src, canonical)`.
    */
  def canonicalLinksCtes(rel: String, idCol: String, urlCol: String,
      htmlCol: String, sfx: String = ""): String = {
    val collapse = (1 to 4).foldLeft("abs_url") { (x, _) =>
      s"regexp_replace(regexp_replace($x, '/\\./', '/'), '/[^/]+/\\.\\./', '/')"
    }
    s"""cn0$sfx AS (SELECT $idCol AS src, $urlCol AS page,
       |    regexp_extract($htmlCol,
       |      '<link[^>]*rel=["'']?canonical["'']?[^>]*href=("[^"]*"|''[^'']*''|[^ >"'']+)', 1) AS c1,
       |    regexp_extract($htmlCol,
       |      '<link[^>]*href=("[^"]*"|''[^'']*''|[^ >"'']+)[^>]*rel=["'']?canonical["'']?', 1) AS c2
       |  FROM $rel),
       |cn1$sfx AS (SELECT src, page,
       |    regexp_replace(regexp_replace(
       |      CASE WHEN c1 <> '' THEN c1 ELSE c2 END,
       |      '^["'']', ''), '["'']$$', '') AS unq
       |  FROM cn0$sfx WHERE c1 <> '' OR c2 <> ''),
       |cn2$sfx AS (SELECT src,
       |    regexp_replace(unq, '#.*$$', '') AS v,
       |    regexp_extract(page, '^(https?://[^/?#]+)', 1) AS origin,
       |    regexp_extract(page, '^(https?:)', 1) AS scheme,
       |    regexp_extract(page, '^[^?#]*', 0) AS p0
       |  FROM cn1$sfx),
       |cn3$sfx AS (SELECT src,
       |    CASE WHEN regexp_matches(v, '^https?://') THEN v
       |         WHEN v LIKE '//%' THEN scheme || v
       |         WHEN v LIKE '/%' THEN origin || v
       |         WHEN v = '' OR regexp_matches(v, '^[A-Za-z][A-Za-z0-9+.-]*:') THEN NULL
       |         ELSE (CASE WHEN regexp_matches(p0, '^https?://[^/]+$$')
       |                 THEN p0 || '/'
       |                 ELSE regexp_replace(p0, '[^/]*$$', '') END) || v
       |    END AS abs_url
       |  FROM cn2$sfx),
       |cn$sfx AS (SELECT src, $collapse AS canonical FROM cn3$sfx
       |  WHERE abs_url IS NOT NULL)""".stripMargin
  }

  /** The regex-metachar escape chain shared by [[urlDecisions]] and
    * [[urlDecisionsCtes]] — applied identically on both engines so a
    * translated robots pattern compiles to the SAME regex text.
    * Backslash first (so later escapes aren't double-escaped), then
    * each metachar, then `*` → `.*` LAST (its regex dot must survive).
    */
  private val RegexMetas: Seq[(String, String)] = Seq(
    "\\" -> "\\\\", "." -> "\\.", "^" -> "\\^", "$" -> "\\$",
    "+" -> "\\+", "?" -> "\\?", "(" -> "\\(", ")" -> "\\)",
    "[" -> "\\[", "]" -> "\\]", "{" -> "\\{", "}" -> "\\}",
    "|" -> "\\|", "*" -> ".*")

  private def regexEscScala(s: String): String =
    RegexMetas.foldLeft(s) { case (acc, (m, r)) => acc.replace(m, r) }

  private def regexEscSql(e: String): String =
    RegexMetas.foldLeft(e) { case (acc, (m, r)) =>
      s"replace($acc, '$m', '$r')"
    }

  /** Robots-style URL rule decisions: each DISTINCT URL takes the
    * action of its MOST SPECIFIC matching rule — longest pattern text
    * per RFC 9309 §2.2.2, measured on the SCHEME-STRIPPED pattern so a
    * rule set mixing `http://host/x` and `host/x/deep` forms ranks by
    * effective prefix, not by a 7-char scheme bonus; ties break by
    * pattern text, then action — so a DUPLICATED pattern with
    * conflicting actions resolves 'allow' deterministically (the
    * Google-robots tie rule), default allow when nothing matches.
    * Patterns support RFC 9309 §2.2.3 WILDCARDS: `*` matches any run
    * of characters and a trailing `$` anchors at end-of-URL (a
    * `Disallow: &#47;*.php$` rule); such patterns translate to
    * anchored regexes (every
    * other regex metachar escaped), while wildcard-free patterns keep
    * the cheap prefix test. `rules(pattern, action)` is model-sized
    * and broadcast; a URL's action is a function of the URL alone, so
    * the decision relation is distinct-URL-sized and joins back to
    * any link relation by key. Matching is SCHEME-AGNOSTIC (robots
    * rules govern the host, not the scheme): both the URL and the
    * pattern drop a leading `http(s)://` before the test, so an
    * `https://` link cannot silently bypass an `http://`-anchored
    * Disallow, and scheme-less `host/path` patterns (the
    * [[parseRobotsFor]] form) match directly. Returns
    * `(url, action)`, action ∈ {'allow','deny'}.
    */
  def urlDecisions(urls: DataFrame, rules: DataFrame): DataFrame = {
    // rule sets are model-sized: collect once, pre-sort by precedence,
    // precompile wildcard regexes, and evaluate as ONE codegen
    // first-match scan per distinct URL (graft.functions.RobotRules) —
    // the relational BNL-join + window recompiled every non-literal
    // regex per (URL × rule) pair
    val rows = rules
      .select(col("pattern").cast("string"), col("action").cast("string"))
      .collect()
    // the collect is the documented model-sized assumption made loud:
    // an unexpectedly corpus-sized rules relation must fail with THIS
    // message, not a driver OOM; NULL pattern/action rows are rejected
    // by name instead of NPE-ing inside compile()
    require(rows.length <= 1000000,
      s"urlDecisions: rules relation has ${rows.length} rows — " +
        "rule sets are model-sized and broadcast; this looks corpus-sized")
    val raw = rows.map { r =>
      require(!r.isNullAt(0) && !r.isNullAt(1),
        s"urlDecisions: NULL pattern or action in rules relation " +
          s"(pattern=${r.getString(0)}, action=${r.getString(1)})")
      (r.getString(0), r.getString(1))
    }.toSeq
    val compiled = graft.functions.RobotRules.compile(raw, regexEscScala)
    urls.select(col("url")).distinct()
      .select(col("url"),
        coalesce(graft.functions.RobotRules.decideCol(col("url"),
          compiled), lit("allow")).as("action"))
  }

  /** DuckDB CTE chain for [[urlDecisions]] over `urlsRel(url)` and
    * `rulesRel(pattern, action)`, ending in `<pfx>dec(url, action)` —
    * the canonical oracle replay (same scheme-strip, same stripped
    * precedence length, same wildcard→regex translation chain).
    */
  def urlDecisionsCtes(urlsRel: String, rulesRel: String,
      pfx: String = "ud"): String = {
    val uStr = "regexp_replace(u.url, '^https?://', '')"
    s"""${pfx}r0 AS (SELECT pattern, action,
       |    regexp_replace(pattern, '^https?://', '') AS s FROM $rulesRel),
       |${pfx}r1 AS (SELECT pattern, action, s,
       |    (s LIKE '%$$') AS anch FROM ${pfx}r0),
       |${pfx}r2 AS (SELECT pattern, action, s, anch,
       |    CASE WHEN anch THEN substr(s, 1, length(s) - 1) ELSE s END AS b
       |  FROM ${pfx}r1),
       |${pfx}rx AS (SELECT pattern, action, length(s) AS plen,
       |    (contains(b, '*') OR anch) AS wild, b,
       |    '^' || ${regexEscSql("b")} ||
       |      (CASE WHEN anch THEN '$$' ELSE '' END) AS re
       |  FROM ${pfx}r2),
       |${pfx}dec AS (SELECT url, coalesce(action, 'allow') AS action FROM (
       |  SELECT u.url, r.action,
       |    row_number() OVER (PARTITION BY u.url
       |      ORDER BY r.plen DESC, r.pattern, r.action) AS rn
       |  FROM $urlsRel u LEFT JOIN ${pfx}rx r
       |    ON ((NOT r.wild AND starts_with($uStr, r.b)) OR
       |        (r.wild AND regexp_matches($uStr, r.re)))) t
       |  WHERE rn = 1)""".stripMargin
  }

  /** Collapse 3xx redirect CHAINS onto their final targets:
    * `redirects(url, location)` — one observed hop per fetched 3xx —
    * resolves to `(url, final_url)` for every source whose chain
    * reaches a NON-redirect URL within `maxHops` follow steps; chains
    * still pointing at a redirect source after the budget (cycles,
    * over-deep chains) DROP rather than resolve — a cycle never
    * reaches a non-source, so the same filter removes it on both
    * engines deterministically, never by iteration-order luck. The
    * relation is fetched-3xx-sized (a crawl-frontier fraction, not
    * corpus-scale); each round is one equi-join on the bounded set,
    * and the loop-invariant input materializes ONCE at entry (the
    * iterative-operator contract — rounds must not re-execute the
    * caller's parse lineage).
    */
  def resolveRedirects(redirects: DataFrame, maxHops: Int = 4)
      : DataFrame = {
    val r = redirects
      .select(col("url"), col("location").as("final_url"))
      .localCheckpoint()
    var cur = r
    (2 to maxHops).foreach { _ =>
      cur = cur
        .join(r.select(col("url").as("__u"),
          col("final_url").as("__t")),
          col("final_url") === col("__u"), "left")
        .select(col("url"),
          coalesce(col("__t"), col("final_url")).as("final_url"))
    }
    cur.join(r.select(col("url").as("__src")),
      col("final_url") === col("__src"), "left_anti")
  }

  /** DuckDB CTE chain for [[resolveRedirects]] over
    * `rel(urlCol, locCol)`, ending in `<pfx>res(url, final_url)` —
    * the follow rounds unrolled, the same drop-unresolved filter.
    */
  def resolveRedirectsCtes(rel: String, urlCol: String, locCol: String,
      maxHops: Int = 4, pfx: String = "rr"): String = {
    val base =
      s"${pfx}0 AS (SELECT $urlCol AS url, $locCol AS final_url FROM $rel)"
    val rounds = (1 until maxHops).map { i =>
      s"""${pfx}$i AS (SELECT c.url,
         |    coalesce(n.final_url, c.final_url) AS final_url
         |  FROM ${pfx}${i - 1} c
         |  LEFT JOIN ${pfx}0 n ON n.url = c.final_url)""".stripMargin
    }
    val last = s"${pfx}${maxHops - 1}"
    (Seq(base) ++ rounds :+
      s"""${pfx}res AS (SELECT c.url, c.final_url FROM $last c
         |  WHERE NOT EXISTS (
         |    SELECT 1 FROM ${pfx}0 s WHERE s.url = c.final_url))""".stripMargin
      ).mkString(",\n")
  }

  /** robots.txt PARSER: `(host, txt)` → the `(pattern, action)` rule
    * relation [[urlDecisions]] consumes. Each `Allow:`/`Disallow:`
    * directive line becomes one host-anchored prefix rule
    * (`http://<host><path>` → allow/deny); everything else —
    * User-agent groups, comments, sitemaps, blank lines — is ignored
    * (the flat single-agent reading; per-agent grouping is policy the
    * caller applies by pre-filtering the text). An empty-path
    * `Disallow:` (the "allow everything" idiom) drops rather than
    * denying the whole host. Model-sized in, model-sized out —
    * robots relations are per-host, never corpus-scale.
    */
  def parseRobots(robots: DataFrame, hostCol: String,
      txtCol: String): DataFrame =
    robots.select(col(hostCol).as("__h"),
        explode(split(col(txtCol), "\n")).as("__l"))
      .select(col("__h"),
        regexp_extract(col("__l"), "(?i)^(Allow|Disallow):\\s*(/\\S*)", 1)
          .as("__d"),
        regexp_extract(col("__l"), "(?i)^(Allow|Disallow):\\s*(/\\S*)", 2)
          .as("__p"))
      .filter(col("__d") =!= "" && col("__p") =!= "")
      .select(concat(lit("http://"), col("__h"), col("__p"))
          .as("pattern"),
        // RFC 9309 field names are case-insensitive — compare folded
        when(lower(col("__d")) === "allow", lit("allow"))
          .otherwise(lit("deny")).as("action"))

  /** DuckDB CTE for [[parseRobots]] over `rel(hostCol, txtCol)`,
    * ending in `probots(pattern, action)`.
    */
  def parseRobotsCtes(rel: String, hostCol: String,
      txtCol: String): String =
    s"""prlines AS (SELECT $hostCol AS h,
       |    unnest(string_split($txtCol, chr(10))) AS l
       |  FROM $rel),
       |prdir AS (SELECT h,
       |    regexp_extract(l, '(?i)^(Allow|Disallow):\\s*(/\\S*)', 1) AS d,
       |    regexp_extract(l, '(?i)^(Allow|Disallow):\\s*(/\\S*)', 2) AS p
       |  FROM prlines),
       |probots AS (SELECT 'http://' || h || p AS pattern,
       |    CASE WHEN lower(d) = 'allow' THEN 'allow' ELSE 'deny' END AS action
       |  FROM prdir WHERE d <> '' AND p <> '')""".stripMargin

  /** The GROUP-aware robots lines for one crawler identity: lines are
    * assigned to their User-agent group (a group = one or more
    * consecutive `User-agent:` lines plus everything until the next
    * group starts — the robots.txt grammar), and a host's selected
    * groups are the ones naming `agent` (case-insensitive exact token)
    * when any group does, else the ones naming `*` — the RFC 9309
    * precedence [[parseRobots]]'s flat reading ignores. Returns the
    * non-User-agent lines of the selected groups as `(__h, __l)`.
    * Lines before any group header belong to no group and drop.
    * Model-sized: robots bodies are per-host; the window partitions
    * on host.
    */
  private def selectedRobotsLines(robots: DataFrame, hostCol: String,
      txtCol: String, agent: String): DataFrame = {
    val byPos = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__h")).orderBy(col("__pos"))
    val lines = robots.select(col(hostCol).as("__h"),
        posexplode(split(col(txtCol), "\n")).as(Seq("__pos", "__l")))
      .withColumn("__ua",
        regexp_extract(col("__l"), "(?i)^User-agent:\\s*(\\S+)", 1))
      .withColumn("__isua", (col("__ua") =!= "").cast("int"))
      .withColumn("__gid", sum(when(col("__isua") === 1 &&
          coalesce(lag(col("__isua"), 1).over(byPos), lit(0)) === 0,
          1).otherwise(0)).over(byPos))
    val groups = lines.filter(col("__isua") === 1)
      .groupBy(col("__h"), col("__gid"))
      .agg(max(when(lower(col("__ua")) === agent.toLowerCase, 1)
          .otherwise(0)).as("__exact"),
        max(when(col("__ua") === "*", 1).otherwise(0)).as("__star"))
    val hostAgg = groups.groupBy(col("__h"))
      .agg(max(col("__exact")).as("__he"))
    val sel = groups.join(hostAgg, Seq("__h"))
      .filter((col("__he") === 1 && col("__exact") === 1) ||
        (col("__he") === 0 && col("__star") === 1))
      .select(col("__h"), col("__gid"))
    lines.join(sel, Seq("__h", "__gid")).filter(col("__isua") === 0)
  }

  /** [[parseRobots]] with USER-AGENT GROUP selection: only the rules
    * addressed to `agent` apply (falling back to the `*` group when no
    * group names the agent — RFC 9309 §2.2.1). Patterns are emitted
    * SCHEME-LESS (`<host><path>`), the form [[urlDecisions]]'
    * scheme-agnostic matching consumes directly, so one rule governs
    * both http and https fetches of the host. Returns
    * `(pattern, action)`.
    */
  def parseRobotsFor(robots: DataFrame, hostCol: String,
      txtCol: String, agent: String): DataFrame =
    selectedRobotsLines(robots, hostCol, txtCol, agent)
      .select(col("__h"),
        regexp_extract(col("__l"), "(?i)^(Allow|Disallow):\\s*(/\\S*)", 1)
          .as("__d"),
        regexp_extract(col("__l"), "(?i)^(Allow|Disallow):\\s*(/\\S*)", 2)
          .as("__p"))
      .filter(col("__d") =!= "" && col("__p") =!= "")
      .select(concat(col("__h"), col("__p")).as("pattern"),
        when(lower(col("__d")) === "allow", lit("allow"))
          .otherwise(lit("deny")).as("action"))

  /** `Crawl-delay:` of the selected group per host, for one crawler
    * identity (same group selection as [[parseRobotsFor]]); when
    * several selected groups carry one, the MINIMUM (most
    * conservative) wins. Hosts without a delay are absent — the
    * crawler's default applies. Returns `(host, delay)` in whole
    * seconds.
    */
  def crawlDelays(robots: DataFrame, hostCol: String,
      txtCol: String, agent: String): DataFrame =
    selectedRobotsLines(robots, hostCol, txtCol, agent)
      .select(col("__h"),
        regexp_extract(col("__l"), "(?i)^Crawl-delay:\\s*([0-9]+)", 1)
          .as("__cd"))
      .filter(col("__cd") =!= "")
      .groupBy(col("__h"))
      .agg(min(col("__cd").cast("long")).as("delay"))
      .select(col("__h").as("host"), col("delay"))

  /** DuckDB CTE chain for [[parseRobotsFor]] + [[crawlDelays]] over
    * `rel(hostCol, txtCol)` for the literal `agent`, ending in
    * `<pfx>rules(host, pattern, action)` — pattern scheme-less — and
    * `<pfx>delay(host, delay)`.
    */
  def parseRobotsForCtes(rel: String, hostCol: String, txtCol: String,
      agent: String, pfx: String = "pf"): String =
    s"""${pfx}l AS (SELECT host, i AS pos, ls[i] AS l FROM
       |    (SELECT $hostCol AS host, string_split($txtCol, chr(10)) AS ls FROM $rel) t,
       |    UNNEST(generate_series(1, len(ls))) AS u(i)),
       |${pfx}u AS (SELECT host, pos, l,
       |    regexp_extract(l, '(?i)^User-agent:\\s*(\\S+)', 1) AS ua,
       |    CASE WHEN regexp_extract(l, '(?i)^User-agent:\\s*(\\S+)', 1) <> '' THEN 1 ELSE 0 END AS isua
       |  FROM ${pfx}l),
       |${pfx}st AS (SELECT host, pos, l, ua, isua,
       |    CASE WHEN isua = 1 AND COALESCE(LAG(isua) OVER (PARTITION BY host ORDER BY pos), 0) = 0 THEN 1 ELSE 0 END AS isstart
       |  FROM ${pfx}u),
       |${pfx}g AS (SELECT host, pos, l, ua, isua,
       |    SUM(isstart) OVER (PARTITION BY host ORDER BY pos) AS gid
       |  FROM ${pfx}st),
       |${pfx}sel AS (SELECT host, gid FROM (
       |    SELECT host, gid, ex, st, MAX(ex) OVER (PARTITION BY host) AS he
       |    FROM (SELECT host, gid,
       |        MAX(CASE WHEN lower(ua) = '${sqlLit(agent.toLowerCase)}' THEN 1 ELSE 0 END) AS ex,
       |        MAX(CASE WHEN ua = '*' THEN 1 ELSE 0 END) AS st
       |      FROM ${pfx}g WHERE isua = 1 GROUP BY host, gid) g) t
       |  WHERE (he = 1 AND ex = 1) OR (he = 0 AND st = 1)),
       |${pfx}ls AS (SELECT p.host, p.l FROM ${pfx}g p
       |  JOIN ${pfx}sel s ON s.host = p.host AND s.gid = p.gid
       |  WHERE p.isua = 0),
       |${pfx}rules AS (SELECT host,
       |    host || regexp_extract(l, '(?i)^(Allow|Disallow):\\s*(/\\S*)', 2) AS pattern,
       |    CASE WHEN lower(regexp_extract(l, '(?i)^(Allow|Disallow):\\s*(/\\S*)', 1)) = 'allow' THEN 'allow' ELSE 'deny' END AS action
       |  FROM ${pfx}ls
       |  WHERE regexp_extract(l, '(?i)^(Allow|Disallow):\\s*(/\\S*)', 1) <> ''
       |    AND regexp_extract(l, '(?i)^(Allow|Disallow):\\s*(/\\S*)', 2) <> ''),
       |${pfx}delay AS (SELECT host,
       |    CAST(MIN(CAST(regexp_extract(l, '(?i)^Crawl-delay:\\s*([0-9]+)', 1) AS BIGINT)) AS BIGINT) AS delay
       |  FROM ${pfx}ls
       |  WHERE regexp_extract(l, '(?i)^Crawl-delay:\\s*([0-9]+)', 1) <> ''
       |  GROUP BY host)""".stripMargin

  /** Escape a string for interpolation into a single-quoted SQL
    * literal (the oracle-authoring-hazard posture: an agent name or
    * stop word carrying an apostrophe must not break the generated
    * SQL at a distance).
    */
  def sqlLit(s: String): String = s.replace("'", "''")

  /** `Sitemap:` directives of a robots relation: `(host, url)` — the
    * crawl-DISCOVERY pointer robots.txt carries alongside its access
    * rules (RFC 9309 §2.3 allows any number, outside any user-agent
    * group, absolute URLs). [[parseRobots]]/[[parseRobotsFor]] ignore
    * these lines by design; this lifts them so the sitemap chain
    * ([[parseSitemapsNested]]) can seed from what sites DECLARE
    * instead of a hardcoded /sitemap.xml convention.
    */
  def sitemapDirectives(robots: DataFrame, hostCol: String,
      txtCol: String): DataFrame =
    robots.select(col(hostCol).as("host"),
        explode(split(col(txtCol), "\n")).as("__l"))
      .select(col("host"),
        regexp_extract(col("__l"), "(?i)^Sitemap:\\s*(https?://\\S+)", 1)
          .as("url"))
      .filter(col("url") =!= "")

  /** DuckDB CTE for [[sitemapDirectives]] over `rel(hostCol, txtCol)`,
    * ending in `<pfx>sm(host, url)`.
    */
  def sitemapDirectivesCtes(rel: String, hostCol: String,
      txtCol: String, pfx: String = "sd"): String =
    s"""${pfx}l AS (SELECT $hostCol AS host,
       |    unnest(string_split($txtCol, chr(10))) AS l
       |  FROM $rel),
       |${pfx}sm AS (SELECT host,
       |    regexp_extract(l, '(?i)^Sitemap:\\s*(https?://\\S+)', 1) AS url
       |  FROM ${pfx}l
       |  WHERE regexp_extract(l, '(?i)^Sitemap:\\s*(https?://\\S+)', 1) <> '')""".stripMargin

  /** Mass scale: ranks are ppt (parts per 10^12) of total mass. */
  val Scale = 1000000000000L

  /** Exact-integer PageRank over distinct `edges(src, dst)` and
    * `nodes(node)`: `rounds` synchronous iterations of
    *
    *   r₀(v)    = Scale div n
    *   rₖ₊₁(v) = (15·Scale) div (100·n)
    *             + (85 · Σ_{(u,v)∈E} (rₖ(u) div outdeg(u))) div 100
    *
    * Truncating-div mass loss (standard in integer PageRank) stays in
    * the fixed point instead of being redistributed — both engines
    * lose identical ulps, so the replay is bit-exact. Nodes without
    * in-links hold the teleport base. Returns `(node, rank)`.
    */
  def pageRank(nodes: DataFrame, edges: DataFrame, rounds: Int)
      : DataFrame = {
    // materialize loop INPUTS once — a caller-supplied derived chain
    // (regex link extraction → canonicalize → distinct) would otherwise
    // re-execute in EVERY round's contrib join (the growing-lineage
    // invariant applies to loop-invariant inputs, not just state)
    val nds = nodes.localCheckpoint()
    val e = edges.localCheckpoint()
    val n = nds.count()
    require(n > 0, "pageRank over an empty node set")
    val base = 15L * Scale / (100L * n)
    // outdeg is joined into the edge relation ONCE (loop-invariant) —
    // the per-round contrib join probes one prejoined relation instead
    // of re-planning ranks⋈outdeg⋈edges every round (guide §2.4). The
    // per-edge `rank div outdeg` terms are the same integer multiset
    // the per-src formulation produced, so the per-dst sums are
    // bit-identical.
    val e2 = e.join(
        e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")), Seq("src"))
      .localCheckpoint()
    var ranks = nds.select(col("node"),
      lit(Scale / n).as("rank")).localCheckpoint()
    for (_ <- 1 to rounds) {
      val contrib = e2.join(ranks, col("src") === col("node"))
        .groupBy(col("dst"))
        .agg(sum(expr("rank div outdeg")).as("__in"))
      ranks = nds.join(contrib, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(base) + expr("(85 * coalesce(__in, 0)) div 100"))
            .as("rank"))
        .localCheckpoint()
    }
    ranks
  }

  /** CONVERGED PageRank: [[pageRank]]'s exact-integer contract plus
    * the two things a real crawl-scale run needs —
    *
    *   1. DANGLING mass: nodes with no out-edges (common once edges
    *      are filtered by robots rules / domain caps) no longer leak
    *      their mass out of the system; each round their total rank D
    *      redistributes uniformly through the same damping term:
    *
    *        rₖ₊₁(v) = (15·Scale) div (100·n)
    *                  + (85 · (Σ in(v) + D div n)) div 100
    *
    *   2. CONVERGENCE stop: iteration ends at the FIRST round k where
    *      the exact-integer total movement Σ_v |rₖ(v) − rₖ₋₁(v)| ≤
    *      `Scale div epsDiv`, else at `maxRounds`. Movement contracts
    *      at the damping rate (0.85/round, graph-independent), so the
    *      stop round is bounded a priori — and because both the delta
    *      and the threshold are integers, an unrolled-CTE oracle
    *      replays the stop decision bit-exactly (min round whose delta
    *      passes, no float tolerance anywhere).
    *
    * The dangling sum rides IN-PLAN as a broadcast 1-row aggregate
    * (no driver collect); only the per-round delta scalar comes back
    * to the driver, for loop control. Returns `(node, rank, rounds)`
    * with `rounds` = the stop round.
    */
  def pageRankConverged(nodes: DataFrame, edges: DataFrame,
      maxRounds: Int, epsDiv: Long = 20L,
      init: Option[DataFrame] = None): DataFrame = {
    // loop-invariant inputs materialize ONCE (see pageRank) — without
    // this a derived edge chain re-ran its extraction every round
    val nds = nodes.localCheckpoint()
    val e = edges.localCheckpoint()
    val n = nds.count()
    require(n > 0, "pageRankConverged over an empty node set")
    val eps = Scale / epsDiv
    val base = 15L * Scale / (100L * n)
    // loop-invariant precomputes (round-19 restructure, guide §2.4 —
    // before it, every round re-joined ranks⋈outdeg⋈edges, anti-joined
    // for the dangling sum, and ran a separate node-keyed join for the
    // convergence delta: 5 joins + 2 shuffling actions per round):
    //  - outdeg folds into the edge relation ONCE (`e2`); the per-edge
    //    `rank div outdeg` terms are the same integer multiset, so
    //    per-dst contrib sums are bit-identical;
    //  - the dangling-node SET (no out-edges) is loop-invariant: it
    //    rides as a boolean flag on the rank state, so the per-round
    //    dangling sum is a filter+agg over the round's checkpoint, not
    //    an anti-join;
    //  - the convergence delta reads a carried `__prev` column off the
    //    new round's checkpoint — no per-round node-keyed delta join.
    val outdeg = e.groupBy(col("src"))
      .agg(count(lit(1)).as("outdeg"))
    val e2 = e.join(outdeg, Seq("src")).localCheckpoint()
    val flagged = nds.join(
        outdeg.select(col("src").as("node"), lit(1).as("__o")),
        Seq("node"), "left")
      .select(col("node"), col("__o").isNull.as("__isdang"))
    // WARM START: seed from a previous fixed point (`init(node, rank)`)
    // instead of uniform — nodes the previous run never saw fall back
    // to the uniform share, stale nodes drop via the join. The
    // iteration map is the same 0.85-contraction from any start, so a
    // seed already near the fixed point converges in the few rounds it
    // takes the graph DELTA to propagate, not the ~log(Scale·epsDiv)
    // rounds a cold start pays — the incremental-crawl economics
    // (IncrementalGraph.rankWarm).
    var ranks = (init match {
      case Some(p) => flagged.join(
          p.select(col("node"), col("rank").as("__warm")),
          Seq("node"), "left")
        .select(col("node"),
          coalesce(col("__warm"), lit(Scale / n)).as("rank"),
          col("__isdang"))
      case None => flagged.select(col("node"),
        lit(Scale / n).as("rank"), col("__isdang"))
    }).localCheckpoint()
    var k = 0
    var done = false
    while (k < maxRounds && !done) {
      val dang = ranks.filter(col("__isdang"))
        .agg(coalesce(sum(col("rank")), lit(0L)).as("__dang"))
      val contrib = e2.join(ranks.select(col("node"), col("rank")),
          col("src") === col("node"))
        .groupBy(col("dst"))
        .agg(sum(expr("rank div outdeg")).as("__in"))
      val next = ranks
        .select(col("node"), col("rank").as("__prev"), col("__isdang"))
        .join(contrib, col("node") === col("dst"), "left")
        .crossJoin(broadcast(dang))
        .select(col("node"),
          (lit(base) + expr(
            s"(85 * (coalesce(__in, 0) + (__dang div ${n}L))) div 100"))
            .as("rank"),
          col("__prev"), col("__isdang"))
        .localCheckpoint()
      val delta = next.agg(sum(abs(col("rank") - col("__prev"))))
        .head().getLong(0)
      done = delta <= eps
      ranks = next.select(col("node"), col("rank"), col("__isdang"))
      k += 1
    }
    ranks.select(col("node"), col("rank")).withColumn("rounds", lit(k))
  }

  /** The unrolled-CTE oracle for [[pageRankConverged]]: `maxRounds`
    * rounds materialize, per-round deltas compute, and the selected
    * round is the first whose delta passes the threshold — relations
    * `wcnodes/wcodeg/wcnn/wcr0…wcr<K>/wcall/wcdelta/wcstop`, final
    * shape `(node, rank, rounds)` via `SELECT … FROM wcall WHERE k =
    * (SELECT k FROM wcstop)`.
    */
  def pageRankConvergedCtes(nodesRel: String, nodeId: String,
      edgesRel: String, maxRounds: Int, epsDiv: Long = 20L,
      pfx: String = "wc", initRel: Option[String] = None): String = {
    val eps = Scale / epsDiv
    val rs = (1 to maxRounds).map { k =>
      s"""${pfx}d${k - 1} AS (SELECT CAST(COALESCE(SUM(r.rank), 0) AS BIGINT) AS dang FROM ${pfx}r${k - 1} r LEFT JOIN ${pfx}odeg o ON o.src = r.node WHERE o.src IS NULL),
         |${pfx}r$k AS (SELECT d.node, (SELECT (15 * $Scale) // (100 * n) FROM ${pfx}nn) + (85 * (coalesce(i.s, 0) + (SELECT dang FROM ${pfx}d${k - 1}) // (SELECT n FROM ${pfx}nn))) // 100 AS rank FROM ${pfx}nodes d LEFT JOIN (SELECT e.dst AS node, CAST(SUM(r.rank // o.outdeg) AS BIGINT) AS s FROM $edgesRel e JOIN ${pfx}r${k - 1} r ON r.node = e.src JOIN ${pfx}odeg o ON o.src = e.src GROUP BY e.dst) i ON i.node = d.node)""".stripMargin
    }
    val union = (0 to maxRounds).map(k =>
      s"SELECT $k AS k, node, rank FROM ${pfx}r$k").mkString(" UNION ALL ")
    // warm start: seed from initRel(node, rank), uniform fallback for
    // nodes the seed never saw — exactly pageRankConverged's init path
    val r0 = initRel match {
      case Some(ir) =>
        s"${pfx}r0 AS (SELECT d.node, COALESCE(i.rank, (SELECT $Scale // n FROM ${pfx}nn)) AS rank FROM ${pfx}nodes d LEFT JOIN $ir i ON i.node = d.node)"
      case None =>
        s"${pfx}r0 AS (SELECT node, (SELECT $Scale // n FROM ${pfx}nn) AS rank FROM ${pfx}nodes)"
    }
    (Seq(
      s"${pfx}nodes AS (SELECT $nodeId AS node FROM $nodesRel)",
      s"${pfx}odeg AS (SELECT src, count(*) AS outdeg FROM $edgesRel GROUP BY src)",
      s"${pfx}nn AS (SELECT count(*) AS n FROM ${pfx}nodes)",
      r0) ++ rs ++ Seq(
      s"${pfx}all AS ($union)",
      s"${pfx}delta AS (SELECT a.k, CAST(SUM(ABS(a.rank - b.rank)) AS BIGINT) AS delta FROM ${pfx}all a JOIN ${pfx}all b ON b.node = a.node AND b.k = a.k - 1 GROUP BY a.k)",
      s"${pfx}stop AS (SELECT COALESCE(MIN(k), $maxRounds) AS k FROM ${pfx}delta WHERE delta <= $eps)"))
      .mkString(",\n")
  }

  /** Exact-integer HITS (hubs & authorities): `rounds` synchronous
    * iterations of the Kleinberg recurrence over distinct
    * `edges(src, dst)` —
    *
    *   a₀(v) = h₀(v) = Scale div n
    *   aₖ(v) = norm( Σ_{(u,v)∈E} hₖ₋₁(u) )
    *   hₖ(v) = norm( Σ_{(v,w)∈E} aₖ(w) )
    *
    * where norm(x) rescales the vector to ~Scale total mass by the
    * TRUNCATING divisor `x div max(total div Scale, 1)` — all-integer,
    * so both engines lose identical ulps and the k-round unrolled CTE
    * replay is bit-exact (the [[pageRank]] contract; L2 normalization
    * would put a sqrt in the loop and portability dies there).
    * PageRank measures endorsement flow; HITS separates DIRECTORY
    * pages (hubs: link to many good authorities) from DESTINATION
    * pages (authorities: linked by many good hubs) — the complementary
    * crawl-quality axis. Each half-round is one edge-keyed join + one
    * aggregation + a broadcast 1-row total; per-round localCheckpoint.
    * Returns `(node, hub, auth)`.
    */
  def hits(nodes: DataFrame, edges: DataFrame, rounds: Int)
      : DataFrame = {
    // loop-invariant inputs materialize ONCE (see pageRank); hits pulls
    // through the edge relation TWICE per round, doubling the waste
    val nds = nodes.localCheckpoint()
    val e = edges.localCheckpoint()
    val n = nds.count()
    require(n > 0, "hits over an empty node set")
    def normed(raw: DataFrame, out: String): DataFrame = {
      val tot = raw.agg(
        coalesce(sum(col("__raw")), lit(0L)).as("__t"))
      raw.crossJoin(broadcast(tot))
        .select(col("node"),
          expr(s"__raw div greatest(__t div ${Scale}L, 1)").as(out))
        .localCheckpoint()
    }
    def pulled(state: DataFrame, stateCol: String, from: String,
        to: String): DataFrame =
      nds.join(
          e.join(state, col(from) === col("node"))
            .select(col(to).as("__k"), col(stateCol).as("__v"))
            .groupBy(col("__k")).agg(sum(col("__v")).as("__raw")),
          col("node") === col("__k"), "left")
        .select(col("node"),
          coalesce(col("__raw"), lit(0L)).as("__raw"))
    var hubs = nds.select(col("node"),
      lit(Scale / n).as("hub")).localCheckpoint()
    var auths = nds.select(col("node"),
      lit(Scale / n).as("auth")).localCheckpoint()
    for (_ <- 1 to rounds) {
      auths = normed(pulled(hubs, "hub", "src", "dst"), "auth")
      hubs = normed(pulled(auths, "auth", "dst", "src"), "hub")
    }
    hubs.join(auths, Seq("node"))
  }

  /** The k-round unrolled-CTE oracle for [[hits]]: per round the raw
    * pulls `whra<k>`/`whrh<k>`, their totals, and the normalized
    * `wha<k>`/`whh<k>`; prefix-parameterized like
    * [[pageRankConvergedCtes]]. Final relations `whh<rounds>(node,
    * hub)` and `wha<rounds>(node, auth)`.
    */
  def hitsCtes(nodesRel: String, nodeId: String, edgesRel: String,
      rounds: Int): String = {
    val rs = (1 to rounds).map { k =>
      s"""whra$k AS (SELECT d.node, CAST(COALESCE(s.v, 0) AS BIGINT) AS raw FROM whnodes d LEFT JOIN (SELECT e.dst AS node, CAST(SUM(h.hub) AS BIGINT) AS v FROM $edgesRel e JOIN whh${k - 1} h ON h.node = e.src GROUP BY e.dst) s ON s.node = d.node),
         |whta$k AS (SELECT CAST(COALESCE(SUM(raw), 0) AS BIGINT) AS t FROM whra$k),
         |wha$k AS (SELECT node, raw // greatest((SELECT t FROM whta$k) // $Scale, 1) AS auth FROM whra$k),
         |whrh$k AS (SELECT d.node, CAST(COALESCE(s.v, 0) AS BIGINT) AS raw FROM whnodes d LEFT JOIN (SELECT e.src AS node, CAST(SUM(a.auth) AS BIGINT) AS v FROM $edgesRel e JOIN wha$k a ON a.node = e.dst GROUP BY e.src) s ON s.node = d.node),
         |whth$k AS (SELECT CAST(COALESCE(SUM(raw), 0) AS BIGINT) AS t FROM whrh$k),
         |whh$k AS (SELECT node, raw // greatest((SELECT t FROM whth$k) // $Scale, 1) AS hub FROM whrh$k)""".stripMargin
    }
    (Seq(
      s"whnodes AS (SELECT $nodeId AS node FROM $nodesRel)",
      s"whnn AS (SELECT count(*) AS n FROM whnodes)",
      s"whh0 AS (SELECT node, (SELECT $Scale // n FROM whnn) AS hub FROM whnodes)",
      s"wha0 AS (SELECT node, (SELECT $Scale // n FROM whnn) AS auth FROM whnodes)") ++ rs)
      .mkString(",\n")
  }

  /** TrustRank (topic-sensitive PageRank): teleport mass lands ONLY on
    * `seeds(node)` — a hand-vetted trusted set — so rank measures
    * proximity to trust through links; spam farms that inflate plain
    * PageRank via link volume get no teleport and only as much trust
    * as real pages link to them. Same exact-integer contract as
    * [[pageRank]]:
    *
    *   r₀(v)    = [v ∈ S] · (Scale div |S|)
    *   rₖ₊₁(v) = [v ∈ S] · ((15·Scale) div (100·|S|))
    *             + (85 · Σ contrib) div 100
    *
    * Returns `(node, trust)`.
    */
  def trustRank(nodes: DataFrame, seeds: DataFrame, edges: DataFrame,
      rounds: Int): DataFrame = {
    val nS = seeds.count()
    require(nS > 0, "trustRank needs a non-empty seed set")
    val base = 15L * Scale / (100L * nS)
    // loop-invariant edges materialize ONCE (see pageRank); `seeded`
    // already checkpoints, covering the nodes side
    val e = edges.localCheckpoint()
    val seeded = nodes.join(
        seeds.select(col("node"), lit(1L).as("__s")), Seq("node"), "left")
      .select(col("node"), coalesce(col("__s"), lit(0L)).as("__s"))
      .localCheckpoint()
    // outdeg folds into the edge relation ONCE (see pageRank — the
    // same loop-invariant prejoin, bit-identical per-dst sums)
    val e2 = e.join(
        e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")), Seq("src"))
      .localCheckpoint()
    var ranks = seeded.select(col("node"),
      (col("__s") * lit(Scale / nS)).as("rank")).localCheckpoint()
    for (_ <- 1 to rounds) {
      val contrib = e2.join(ranks, col("src") === col("node"))
        .groupBy(col("dst"))
        .agg(sum(expr("rank div outdeg")).as("__in"))
      ranks = seeded.join(contrib, col("node") === col("dst"), "left")
        .select(col("node"),
          (col("__s") * lit(base) +
            expr("(85 * coalesce(__in, 0)) div 100")).as("rank"))
        .localCheckpoint()
    }
    ranks.select(col("node"), col("rank").as("trust"))
  }

  /** The k-round unrolled-CTE oracle for [[trustRank]]: relations
    * `wtnodes` (node + seed flag), `wtodeg`, `wtns`, `wtr0` …
    * `wtr<rounds>` over `edges(src, dst)`, `nodes`, and
    * `seedsRel(node)`.
    */
  def trustRankCtes(nodesRel: String, nodeId: String, seedsRel: String,
      edgesRel: String, rounds: Int): String = {
    val rs = (1 to rounds).map { k =>
      s"""wtr$k AS (SELECT d.node, d.s * (SELECT (15 * $Scale) // (100 * ns) FROM wtns) + (85 * coalesce(i.sm, 0)) // 100 AS rank FROM wtnodes d LEFT JOIN (SELECT e.dst AS node, CAST(SUM(r.rank // o.outdeg) AS BIGINT) AS sm FROM $edgesRel e JOIN wtr${k - 1} r ON r.node = e.src JOIN wtodeg o ON o.src = e.src GROUP BY e.dst) i ON i.node = d.node)"""
    }
    (Seq(
      s"wtnodes AS (SELECT n.node, CASE WHEN s.node IS NULL THEN 0 ELSE 1 END AS s FROM (SELECT $nodeId AS node FROM $nodesRel) n LEFT JOIN $seedsRel s ON s.node = n.node)",
      s"wtodeg AS (SELECT src, count(*) AS outdeg FROM $edgesRel GROUP BY src)",
      s"wtns AS (SELECT count(*) AS ns FROM $seedsRel)",
      s"wtr0 AS (SELECT node, s * (SELECT $Scale // ns FROM wtns) AS rank FROM wtnodes)") ++ rs)
      .mkString(",\n")
  }

  /** sitemap.xml PARSER: `(host, xml)` → one row per `<url>` entry,
    * `(host, url, lastmod)` — the crawl-seeding companion to
    * [[parseRobots]] (robots says what NOT to fetch; sitemaps say what
    * the site WANTS fetched, with freshness hints). `<loc>` is
    * required per the protocol — entries without one drop; `<lastmod>`
    * is optional and surfaces as `''` when absent (countable, never
    * NULL). Entry blocks are matched non-greedily on a single line —
    * feed normalized (newline-stripped) XML, the form sitemap
    * generators emit anyway. Sitemap relations are per-host
    * directory listings — model-sized next to the corpus; parsing is
    * one extract-all + two per-entry extracts, no shuffle.
    */
  def parseSitemaps(maps: DataFrame, hostCol: String,
      xmlCol: String): DataFrame =
    maps.select(col(hostCol).as("host"),
        explode(expr(
          s"regexp_extract_all($xmlCol, '<url>(.*?)</url>', 1)"))
          .as("__e"))
      .select(col("host"),
        regexp_extract(col("__e"), "<loc>([^<]+)</loc>", 1).as("url"),
        regexp_extract(col("__e"), "<lastmod>([^<]+)</lastmod>", 1)
          .as("lastmod"))
      .filter(col("url") =!= "")

  /** DuckDB CTE for [[parseSitemaps]] over `rel(hostCol, xmlCol)`,
    * ending in `<pfx>maps(host, url, lastmod)`.
    */
  def parseSitemapsCtes(rel: String, hostCol: String,
      xmlCol: String, pfx: String = "ps"): String =
    s"""${pfx}ent AS (SELECT $hostCol AS host,
       |    unnest(regexp_extract_all($xmlCol, '<url>(.*?)</url>', 1)) AS e
       |  FROM $rel),
       |${pfx}maps AS (SELECT host,
       |    regexp_extract(e, '<loc>([^<]+)</loc>', 1) AS url,
       |    regexp_extract(e, '<lastmod>([^<]+)</lastmod>', 1) AS lastmod
       |  FROM ${pfx}ent
       |  WHERE regexp_extract(e, '<loc>([^<]+)</loc>', 1) <> '')""".stripMargin

  /** `<sitemapindex>` entries of a sitemap relation: `(host, child)` —
    * one row per `<sitemap><loc>` child reference (the nesting form
    * large sites shard their URL inventory into; [[parseSitemaps]]
    * reads `<url>` entries only and sees an index file as empty).
    * Blocks without a `<loc>` drop, like the protocol requires.
    */
  def parseSitemapIndex(maps: DataFrame, hostCol: String,
      xmlCol: String): DataFrame =
    maps.select(col(hostCol).as("host"),
        explode(expr(
          s"regexp_extract_all($xmlCol, '<sitemap>(.*?)</sitemap>', 1)"))
          .as("__e"))
      .select(col("host"),
        regexp_extract(col("__e"), "<loc>([^<]+)</loc>", 1).as("child"))
      .filter(col("child") =!= "")

  /** ONE level of sitemap nesting resolved: direct `<url>` entries of
    * the root files, plus the `<url>` entries of every child sitemap a
    * root `<sitemapindex>` references — child CONTENT is looked up in
    * `fetched(urlCol, fxmlCol)` (the crawl's fetch results; an index
    * names files, it does not inline them), and child entries are
    * attributed to the ROOT's host (the site whose inventory they
    * shard). Children an index declares but the crawl never fetched
    * contribute nothing — countable by anti-joining
    * [[parseSitemapIndex]] against `fetched`. Returns
    * `(host, url, lastmod)`, duplicates preserved like
    * [[parseSitemaps]].
    */
  def parseSitemapsNested(roots: DataFrame, hostCol: String,
      xmlCol: String, fetched: DataFrame, urlCol: String,
      fxmlCol: String): DataFrame = {
    val direct = parseSitemaps(roots, hostCol, xmlCol)
    val children = parseSitemapIndex(roots, hostCol, xmlCol)
      .join(fetched.select(col(urlCol).as("child"),
        col(fxmlCol).as("__cxml")), Seq("child"))
    val childEntries = parseSitemaps(
      children.select(col("host"), col("__cxml").as("__x")),
      "host", "__x")
    direct.unionByName(childEntries)
  }

  /** DuckDB CTE chain for [[parseSitemapsNested]] over roots
    * `rootsRel(hostCol, xmlCol)` and fetched child files
    * `fetchedRel(urlCol, fxmlCol)`, ending in
    * `<pfx>maps(host, url, lastmod)`.
    */
  def parseSitemapsNestedCtes(rootsRel: String, hostCol: String,
      xmlCol: String, fetchedRel: String, urlCol: String,
      fxmlCol: String, pfx: String = "pn"): String =
    Seq(
      parseSitemapsCtes(rootsRel, hostCol, xmlCol, s"${pfx}d"),
      s"""${pfx}i AS (SELECT host,
         |    regexp_extract(e, '<loc>([^<]+)</loc>', 1) AS child
         |  FROM (SELECT $hostCol AS host,
         |      unnest(regexp_extract_all($xmlCol, '<sitemap>(.*?)</sitemap>', 1)) AS e
         |    FROM $rootsRel) t
         |  WHERE regexp_extract(e, '<loc>([^<]+)</loc>', 1) <> '')""".stripMargin,
      s"${pfx}c AS (SELECT i.host, f.$fxmlCol AS xml FROM ${pfx}i i JOIN $fetchedRel f ON f.$urlCol = i.child)",
      parseSitemapsCtes(s"${pfx}c", "host", "xml", s"${pfx}c2"),
      s"${pfx}maps AS (SELECT * FROM ${pfx}dmaps UNION ALL SELECT * FROM ${pfx}c2maps)")
      .mkString(",\n")

  /** [[parseSitemapsNested]] generalized to ARBITRARY nesting depth —
    * real sitemap trees shard index files into index files. Per level
    * the frontier of `(host, child-url)` references looks its content
    * up in `fetched(urlCol, fxmlCol)`, collects the children's direct
    * `<url>` entries (attributed to the ROOT host, like the one-level
    * form), and the children's own `<sitemapindex>` references become
    * the next frontier — MINUS everything already expanded for that
    * host (the cycle guard: an index tree with a planted cycle
    * terminates idempotently because a (host, child) pair expands
    * exactly once). Children the crawl never fetched contribute
    * nothing, like the one-level form. A frontier still non-empty
    * after `maxDepth` levels FAILS LOUDLY — silently dropping
    * unexpanded shards would under-report a site's inventory.
    *
    * Scale: one bounded driver loop (depth of the deepest real tree,
    * single digits); each round is a broadcastable join of the
    * model-sized frontier against `fetched`, and the accumulating
    * relations `localCheckpoint` per round (growing-lineage
    * invariant). Returns `(host, url, lastmod)`.
    */
  def parseSitemapsRecursive(roots: DataFrame, hostCol: String,
      xmlCol: String, fetched: DataFrame, urlCol: String,
      fxmlCol: String, maxDepth: Int = 8): DataFrame = {
    val f = fetched.select(col(urlCol).as("__furl"),
      col(fxmlCol).as("__fxml")).localCheckpoint()
    var entries = parseSitemaps(roots, hostCol, xmlCol).localCheckpoint()
    var frontier = parseSitemapIndex(roots, hostCol, xmlCol)
      .distinct().localCheckpoint()
    var visited = frontier
    var depth = 1
    while (depth <= maxDepth && !frontier.isEmpty) {
      val fetchedChildren = frontier
        .join(f, col("child") === col("__furl"))
        .select(col("host"), col("__fxml").as("__x"))
        .localCheckpoint()
      entries = entries.unionByName(
        parseSitemaps(fetchedChildren, "host", "__x")).localCheckpoint()
      frontier = parseSitemapIndex(fetchedChildren, "host", "__x")
        .distinct()
        .join(visited, Seq("host", "child"), "left_anti")
        .localCheckpoint()
      visited = visited.unionByName(frontier).localCheckpoint()
      depth += 1
    }
    require(frontier.isEmpty,
      s"sitemap index tree deeper than maxDepth=$maxDepth " +
        "(or an unexpanded shard cycle) — raise maxDepth; " +
        "silently dropping shards would under-report the inventory")
    entries
  }

  /** Unrolled-CTE oracle for [[parseSitemapsRecursive]] at a FIXED
    * `levels` (the fixture's tree depth): per level k the frontier is
    * the previous level's children minus every earlier frontier
    * (UNION ALL + GROUP BY per the RECURSIVE-WITH dedup hazard —
    * expressed as an anti-join), entries accumulate. Ends in
    * `<pfx>maps(host, url, lastmod)`.
    */
  def parseSitemapsRecursiveCtes(rootsRel: String, hostCol: String,
      xmlCol: String, fetchedRel: String, urlCol: String,
      fxmlCol: String, levels: Int, pfx: String = "pr"): String = {
    def idx(rel: String, h: String, x: String, out: String) =
      s"""$out AS (SELECT host,
         |    regexp_extract(e, '<loc>([^<]+)</loc>', 1) AS child
         |  FROM (SELECT $h AS host,
         |      unnest(regexp_extract_all($x, '<sitemap>(.*?)</sitemap>', 1)) AS e
         |    FROM $rel) t
         |  WHERE regexp_extract(e, '<loc>([^<]+)</loc>', 1) <> '')""".stripMargin
    val parts = Seq.newBuilder[String]
    parts += parseSitemapsCtes(rootsRel, hostCol, xmlCol, s"${pfx}d")
    parts += idx(rootsRel, hostCol, xmlCol, s"${pfx}f1")
    parts += s"${pfx}v1 AS (SELECT DISTINCT host, child FROM ${pfx}f1)"
    (1 to levels).foreach { k =>
      // fetched content of this frontier, entries, next frontier
      parts += s"${pfx}c$k AS (SELECT fr.host, f.$fxmlCol AS xml " +
        s"FROM ${pfx}v$k fr JOIN $fetchedRel f ON f.$urlCol = fr.child)"
      parts += parseSitemapsCtes(s"${pfx}c$k", "host", "xml",
        s"${pfx}e$k")
      if (k < levels) {
        parts += idx(s"${pfx}c$k", "host", "xml", s"${pfx}g$k")
        parts += s"${pfx}v${k + 1} AS (SELECT DISTINCT g.host, g.child " +
          s"FROM ${pfx}g$k g LEFT JOIN (" +
          (1 to k).map(j => s"SELECT host, child FROM ${pfx}v$j")
            .mkString(" UNION ALL ") +
          ") v ON v.host = g.host AND v.child = g.child " +
          "WHERE v.child IS NULL)"
      }
    }
    parts += s"${pfx}maps AS (" +
      ((s"SELECT * FROM ${pfx}dmaps" +:
        (1 to levels).map(k => s"SELECT * FROM ${pfx}e${k}maps"))
        .mkString(" UNION ALL ")) + ")"
    parts.result().mkString(",\n")
  }

  /** Exact BFS hop distance from a seed set: `(node, dist)` with
    * `dist` the minimum edge count from ANY seed (0 for seeds, −1 for
    * nodes unreached within `maxHops`) — the crawl-DEPTH feature
    * quality pipelines weight by (pages far from any trusted seed are
    * disproportionately spam, the TrustRank intuition as a hop count
    * instead of a mass).
    *
    * FRONTIER-only expansion: round k joins edges against just the
    * nodes first reached at round k−1 (an anti-join peels the already
    * settled), so total work is O(Σ frontier-adjacent edges) — each
    * edge is expanded exactly once over the whole run, not once per
    * round. A newly reached node's depth is exactly the round that
    * found it, which is also the min-fold the unrolled oracle
    * computes, so the two formulations agree bit-exactly. Settled
    * state `localCheckpoint`s per round (growing-lineage invariant);
    * the loop short-circuits on an empty frontier — the one
    * driver-side scalar per round.
    */
  def hopDistance(nodes: DataFrame, edges: DataFrame, seeds: DataFrame,
      maxHops: Int): DataFrame = {
    // loop-invariant edges materialize ONCE (see pageRank)
    val e = edges.localCheckpoint()
    var dist = seeds.select(col("node"), lit(0L).as("dist"))
      .distinct().localCheckpoint()
    var frontier = dist
    var k = 1
    var exhausted = false
    while (k <= maxHops && !exhausted) {
      val next = e.join(
          frontier.select(col("node").as("__u")),
          col("src") === col("__u"))
        .select(col("dst").as("node")).distinct()
        .join(dist.select(col("node")), Seq("node"), "left_anti")
        .select(col("node"), lit(k.toLong).as("dist"))
        .localCheckpoint()
      exhausted = next.isEmpty
      dist = dist.unionByName(next).localCheckpoint()
      frontier = next
      k += 1
    }
    nodes.join(dist, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("dist"), lit(-1L)).as("dist"))
  }

  /** The unrolled min-fold oracle for [[hopDistance]]: relations
    * `<pfx>0…<pfx><maxHops>` (each round folds one edge expansion into
    * a per-node MIN — UNION ALL + GROUP BY, never bare UNION, per the
    * RECURSIVE-WITH dedup hazard) and the final
    * `<pfx>dist(node, dist)` with −1 for unreached. `seedsRel` must
    * expose a `node` column.
    */
  def hopDistanceCtes(nodesRel: String, nodeId: String,
      edgesRel: String, seedsRel: String, maxHops: Int,
      pfx: String = "hd"): String = {
    val rs = (1 to maxHops).map { k =>
      s"""$pfx$k AS (SELECT node, CAST(MIN(dist) AS BIGINT) AS dist FROM (SELECT node, dist FROM $pfx${k - 1} UNION ALL SELECT e.dst AS node, d.dist + 1 AS dist FROM $pfx${k - 1} d JOIN $edgesRel e ON e.src = d.node) u GROUP BY node)"""
    }
    (Seq(
      s"${pfx}0 AS (SELECT DISTINCT node, CAST(0 AS BIGINT) AS dist FROM $seedsRel)") ++ rs ++ Seq(
      s"${pfx}dist AS (SELECT n.node, COALESCE(d.dist, -1) AS dist FROM (SELECT $nodeId AS node FROM $nodesRel) n LEFT JOIN $pfx$maxHops d ON d.node = n.node)"))
      .mkString(",\n")
  }

  /** The k-round unrolled-CTE oracle for [[pageRank]]: relations
    * `wgodeg`, `wgnn`, `wgr0` … `wgr<rounds>` over `edges(src, dst)`
    * and `nodes(<nodeIdExpr> AS node)`. CAST(SUM AS BIGINT) guards the
    * HUGEINT promotion; concat stays at line end (stripMargin hazard).
    */
  def pageRankCtes(nodesRel: String, nodeId: String, edgesRel: String,
      rounds: Int): String = {
    val rs = (1 to rounds).map { k =>
      s"""wgr$k AS (SELECT d.node, (SELECT (15 * $Scale) // (100 * n) FROM wgnn) + (85 * coalesce(i.s, 0)) // 100 AS rank FROM wgnodes d LEFT JOIN (SELECT e.dst AS node, CAST(SUM(r.rank // o.outdeg) AS BIGINT) AS s FROM $edgesRel e JOIN wgr${k - 1} r ON r.node = e.src JOIN wgodeg o ON o.src = e.src GROUP BY e.dst) i ON i.node = d.node)"""
    }
    (Seq(
      s"wgnodes AS (SELECT $nodeId AS node FROM $nodesRel)",
      s"wgodeg AS (SELECT src, count(*) AS outdeg FROM $edgesRel GROUP BY src)",
      s"wgnn AS (SELECT count(*) AS n FROM wgnodes)",
      s"wgr0 AS (SELECT node, (SELECT $Scale // n FROM wgnn) AS rank FROM wgnodes)") ++ rs)
      .mkString(",\n")
  }
}
