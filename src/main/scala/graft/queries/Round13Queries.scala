package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 queries: the unk-free tokenizer-artifact contract
  * (reserved `<unk>` id 0 — a loader can embed EVERY id in the tape),
  * plus this round's graph/catalog front-door additions.
  *
  * Reference scope: the tokenizer-artifact chain extends the loader
  * export family (q170/q183/q225); nothing here maps to
  * /root/reference/SCD_script.txt — these are the
  * training-data-pipeline operators the north star adds on top.
  */
object Round13Queries {

  private val toksExpr =
    """list_filter(string_split_regex(text, '\s+'), x -> x <> '')"""

  /** q232's OOV plant, shared verbatim with its oracle (and q243's —
    * the byte-fallback twin encodes the same held-out corpus).
    */
  private[queries] val PlantedHeldOut = "zeta vortex quiz oxbow the of and zax"

  // ---- the REALISTIC linked crawl (q233) ----------------------------
  // q207's corpus holds only absolute double-quoted hrefs — the form
  // WebGraph.links was built for. This one plants the forms a real
  // crawl is mostly made of: the SAME md5-derived target behind
  // double-quoted / single-quoted+utm / unquoted+fragment hrefs, a
  // second target behind root-relative AND ../-relative paths, a
  // protocol-relative third, plus mailto:/fragment-only noise — so
  // resolution + canonicalization must collapse 8 href values per page
  // to 3 doc targets (or the count is wrong).

  private def rUrlOf(t: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    concat(lit("http://d"), (t % 20).cast("string"),
      lit(".example.com/p/"), t.cast("string"))

  private def rUrlSqlOf(t: String): String =
    s"'http://d' || CAST(($t) % 20 AS VARCHAR) || '.example.com/p/' || CAST($t AS VARCHAR)"

  private[graft] def realisticPages(s: SparkSession, dir: String)
      : DataFrame = {
    import graft.functions.PortableHash
    val docs = Tables(s, dir, "documents").select(col("doc_id"))
    val n = Tables.docCount(s, dir)
    def t(seed: Int) =
      PortableHash.hash60(col("doc_id").cast("string"), seed) % n
    val (t1, t2, t3) = (t(74), t(75), t(76))
    val html = concat(
      lit("<html><body><a href=\"/\">Home</a>"),
      lit("<a href=\""), rUrlOf(t1), lit("\">a</a>"),
      lit("<a href='"), rUrlOf(t1), lit("?utm_source=feed'>b</a>"),
      lit("<a href="), rUrlOf(t1), lit("#top>c</a>"),
      lit("<a href=\"/p/"), t2.cast("string"), lit("\">d</a>"),
      lit("<a href=\"../p/"), t2.cast("string"), lit("\">e</a>"),
      lit("<a href=\"//d"), (t3 % 20).cast("string"),
      lit(".example.com/p/"), t3.cast("string"), lit("\">f</a>"),
      lit("<a href=\"mailto:ops@example.com\">g</a>"),
      lit("<a href=\"#top\">h</a></body></html>"))
    docs.select(col("doc_id"), rUrlOf(col("doc_id")).as("url"),
      html.as("html"))
  }

  /** Oracle CTE `rlpages(doc_id, url, html)` — the [[realisticPages]]
    * replay. Concat operators stay at line END (stripMargin hazard).
    */
  private val rlpagesCte: String = {
    import graft.functions.PortableHash
    def t(seed: Int) =
      s"(${PortableHash.hash60Sql("CAST(doc_id AS VARCHAR)", seed)} % (SELECT n FROM rlpn))"
    val (t1, t2, t3) = (t(74), t(75), t(76))
    s"""rlpn AS (SELECT count(*) AS n FROM documents),
       |rlpages AS (SELECT doc_id, ${rUrlSqlOf("doc_id")} AS url,
       |    '<html><body><a href="/">Home</a><a href="' ||
       |    ${rUrlSqlOf(t1)} || '">a</a><a href=' || chr(39) ||
       |    ${rUrlSqlOf(t1)} || '?utm_source=feed' || chr(39) ||
       |    '>b</a><a href=' ||
       |    ${rUrlSqlOf(t1)} || '#top>c</a><a href="/p/' ||
       |    CAST($t2 AS VARCHAR) || '">d</a><a href="../p/' ||
       |    CAST($t2 AS VARCHAR) || '">e</a><a href="//d' ||
       |    CAST($t3 % 20 AS VARCHAR) || '.example.com/p/' ||
       |    CAST($t3 AS VARCHAR) ||
       |    '">f</a><a href="mailto:ops@example.com">g</a><a href="#top">h</a></body></html>' AS html
       |  FROM documents)""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // UNK-FREE vocab-id export: the artifact contract q183 could not
    // honor — its tape writes −1 for OOV tokens, an id no loader can
    // embed. Here the vocabulary is FROZEN on a train slice
    // (doc_id % 3 <> 0), re-based with slot 0 reserved for `<unk>`
    // (reserveUnk: every trained id shifts up by one), and a HELD-OUT
    // slice (doc_id % 3 = 0) encodes through it — genuinely-unseen
    // symbols land on id 0, so the tape is non-negative by
    // construction. Output: per-sequence checksum + the unk count and
    // the tape-wide min id (the zero-minus-one proof, read back from
    // the published artifact, not the plan that wrote it).
    "q232_unk_free_export" -> ((s, dir) => {
      import java.nio.file.Files
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"))
      val train = docs.filter(col("doc_id") % 3 =!= 0)
      // the corpus alphabet is a–y minus x/z (all SFs) — the planted
      // doc's x/z words force genuinely-OOV symbols through the unk
      // slot, mixed with in-vocab words in the same doc (both sides of
      // the coalesce execute, not just the happy path)
      import s.implicits._
      val held = docs.filter(col("doc_id") % 3 === 0)
        .unionByName(Seq((9999991L, PlantedHeldOut)).toDF("doc_id", "text"))
      val merges = graft.text.Bpe.trainMerges(train, "text",
        Round7Queries.BpeK)
      val voc = graft.text.Bpe.vocab(train, "text", merges)
      val reserved = graft.pipeline.Packing.reserveUnk(voc)
      val stream = graft.text.Bpe.symbolStream(held, "doc_id", "text",
        merges)
      val root = Files.createTempDirectory("graft-q232").toString
      val cat = new graft.catalog.ParquetCatalog(s, root)
      graft.pipeline.Packing.exportShardsOf("doc_id", stream, cat,
        "shards", seqLen = 2048, numGroups = 8,
        vocabIds = Some(reserved), unkId = Some(0))
      val (bin, _) = graft.pipeline.Packing.readShards(cat, "shards")
      // per-sequence HOF lambdas are bounded (<= 2048 elements) and
      // sequence-count-sized — the Bm25 per-doc exemption, not a
      // corpus-sized CodegenFallback path
      val out = bin
        .select(col("grp"), col("seq"), col("n_tok"),
          graft.functions.TokenBinary.weightedSumCol(col("tokens"))
            .as("tok_wsum"),
          size(filter(
            graft.functions.TokenBinary.unpackCol(col("tokens")),
            t => t === 0)).cast("long").as("n_unk"),
          array_min(
            graft.functions.TokenBinary.unpackCol(col("tokens")))
            .cast("long").as("min_tid"))
        .orderBy(col("grp"), col("seq"))
        .localCheckpoint()
      Round7bQueries.rmTree(root)
      out
    }),

    // LINK RESOLUTION + canonical edge collapse: realistic extraction
    // (all three quote forms), browser-style resolution against the
    // page URL, canonical identity, and the doc-edge build composed on
    // top. Per src domain: resolved link volume (7 of 9 hrefs survive
    // — mailto:/#top drop), distinct resolved URLs, distinct canonical
    // URLs (utm/fragment/relative variants collapse), and the distinct
    // canonical doc-edge count. Extraction + resolution are per-page
    // codegen string ops; the report is two keyed aggregations.
    "q233_link_resolution" -> ((s, dir) => {
      import graft.graph.WebGraph
      val links = WebGraph.resolvedLinks(realisticPages(s, dir),
        "doc_id", "url", "html")
      val canon = links.select(col("src"), col("url"),
        WebGraph.canonicalUrl(col("url")).as("canon"))
      val linkAgg = canon.groupBy((col("src") % 20).as("src_dom"))
        .agg(count(lit(1)).as("n_resolved"),
          countDistinct(col("url")).as("n_raw"),
          countDistinct(col("canon")).as("n_canon"))
      val edges = canon.select(col("src"),
          regexp_extract(col("canon"), "/p/([0-9]+)$", 1).as("__t"))
        .filter(col("__t") =!= "")
        .select(col("src"), col("__t").cast("long").as("dst"))
        .distinct()
      val edgeAgg = edges.groupBy((col("src") % 20).as("src_dom"))
        .agg(count(lit(1)).as("n_edges"))
      linkAgg.join(edgeAgg, Seq("src_dom"), "left")
        .select(col("src_dom"), col("n_resolved"), col("n_raw"),
          col("n_canon"), coalesce(col("n_edges"), lit(0L)).as("n_edges"))
        .orderBy(col("src_dom"))
    }),

    // CONVERGED PageRank with dangling-mass redistribution: a quarter
    // of the sources drop their out-edges (the robots/cap filtering a
    // real crawl applies), so real dangling nodes exist — their mass
    // redistributes through the damping term instead of leaking, and
    // iteration stops at the FIRST round whose exact-integer total
    // movement falls under Scale/100000 (not a fixed count). The stop
    // round rides along as a column; the oracle replays all rounds and
    // selects the same first-passing one — integer delta, integer
    // threshold, no float tolerance.
    "q234_pagerank_converged" -> ((s, dir) => {
      import graft.graph.WebGraph
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id").as("node"))
      val edges = WebGraph.docEdges(
          WebGraph.links(Round11bQueries.linkedPages(s, dir),
            "doc_id", "html"))
        .filter(col("src") % 4 =!= 0)
      val ranks = WebGraph.pageRankConverged(docs, edges,
        maxRounds = 25, epsDiv = 100000L)
      ranks.select(col("node"), (col("node") % 20).as("dom"),
          col("rank"), col("rounds"))
        .orderBy(col("rank").desc, col("node"))
        .limit(100)
    }),

    // ANN QUALITY through the SQL FRONT DOOR: q231's recall@10/MRR
    // report re-run with the approximate side produced by the
    // graft_ann_topk TVF — the surface a SQL user actually calls —
    // which routes to ivfPqTopKRefined (IVF-PQ + exact re-rank, the
    // honest index; its defaults ARE q136's measured configuration).
    // The recall a TVF user gets is the 0.62-at-nProbe=4 curve, not
    // q231's ~2% single-probe LSH; both engines agree on every
    // per-query ppm.
    "q235_ann_tvf_recall" -> ((s, dir) => {
      graft.functions.GraftExtensions.register(s)
      val emb = Tables(s, dir, "embeddings")
      emb.filter(col("vec_id") < 50)
        .createOrReplaceTempView("q235_queries")
      emb.createOrReplaceTempView("q235_corpus")
      val approx = s.sql("SELECT * FROM graft_ann_topk(" +
        "'q235_queries', 'q235_corpus', 'vec_id', 'embedding', 10)")
      val qs = emb.filter(col("vec_id") < 50)
      val exact = graft.similarity.Similarity.bruteForceTopK(
        qs, emb, "vec_id", "embedding", 10)
      val ov = exact.select(col("q_id"), col("n_id"))
        .join(approx.select(col("q_id"), col("n_id")),
          Seq("q_id", "n_id"))
        .groupBy(col("q_id")).agg(count(lit(1)).as("n_overlap"))
      val rr = exact.filter(col("rank") === 1)
        .select(col("q_id"), col("n_id"))
        .join(approx.select(col("q_id"), col("n_id"),
          col("rank").as("arank")), Seq("q_id", "n_id"), "left")
        .select(col("q_id"),
          coalesce(expr("1000000 div arank"), lit(0L)).as("rr_ppm"))
      qs.select(col("vec_id").as("q_id"))
        .join(ov, Seq("q_id"), "left")
        .join(rr, Seq("q_id"), "left")
        .select(col("q_id"),
          coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
          expr("coalesce(n_overlap, 0) * 1000000 div 10")
            .as("recall_ppm"),
          coalesce(col("rr_ppm"), lit(0L)).as("rr_ppm"))
        .orderBy(col("q_id"))
    }),

    // ALTER TABLE ADD COLUMN across the version chain: seed → widen
    // (one NULL column, one DEFAULT-filled) → UPDATE fills half the
    // rows — three atomic versions. The report joins the CURRENT
    // widened content against the PRE-ALTER version read by time
    // travel (old_len comes from a snapshot whose schema has no lang/
    // score), so the query only works if every version reads under
    // its own schema.
    "q236_alter_table" -> ((s, dir) => {
      import java.nio.file.Files
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"),
          length(col("text")).cast("long").as("text_len"))
      val root = Files.createTempDirectory("graft-q236").toString
      val cat = new graft.catalog.ParquetCatalog(s, root)
      cat.create("dd", docs.schema)
      cat.overwrite("dd", docs)
      val v0 = cat.currentVersion("dd").get
      graft.scd.DdlSql.execute(s, cat,
        "ALTER TABLE dd ADD COLUMNS (lang STRING, score BIGINT DEFAULT 0)")
      graft.scd.DmlSql.execute(s, cat,
        "UPDATE dd SET lang = 'en', score = text_len * 2 " +
          "WHERE doc_id % 2 = 0")
      val old = cat.tableAsOfVersion("dd", v0)
        .select(col("doc_id"), col("text_len").as("old_len"))
      val out = cat.table("dd").join(old, Seq("doc_id"))
        .select(col("doc_id"), col("text_len"), col("old_len"),
          col("lang"), col("score"))
        .orderBy(col("doc_id"))
        .localCheckpoint()
      Round7bQueries.rmTree(root)
      out
    }),

    // WARM-START rank maintenance, end-to-end oracle-checked: phase 1
    // converges cold on the two-thirds graph (src % 3 <> 2 — the last
    // third's sources are dangling, exercising redistribution), the
    // last third folds in via IncrementalGraph, and phase 2 re-ranks
    // WARM from phase 1's fixed point. The oracle replays BOTH
    // converged chains (the second seeded from the first's selected
    // round) — every round, both stop decisions, and the warm seed
    // join are exact integers, so the maintained ranks hash-check.
    "q237_warm_rank" -> ((s, dir) => {
      import graft.graph.IncrementalGraph
      val pages = Round11bQueries.linkedPages(s, dir)
      val nodes = Tables(s, dir, "documents")
        .select(col("doc_id").as("node"))
      var idx = IncrementalGraph.build(
        pages.filter(col("doc_id") % 3 =!= 2), "doc_id", "html")
      val prev = IncrementalGraph.rankConverged(idx, nodes,
        maxRounds = 20, epsDiv = 100000L).localCheckpoint()
      idx = IncrementalGraph.addBatch(idx,
        pages.filter(col("doc_id") % 3 === 2), "doc_id", "html")
      val warm = IncrementalGraph.rankWarm(idx, nodes, prev,
        maxRounds = 20, epsDiv = 100000L)
      warm.select(col("node"), (col("node") % 20).as("dom"),
          col("rank"), col("rounds"))
        .orderBy(col("rank").desc, col("node"))
        .limit(100)
    }),

    // robots.txt PARSE → DECIDE composition: each domain publishes a
    // robots body (user-agent line, a sitemap, a digit-prefix
    // Disallow, a longer Allow carve-out that must WIN by prefix
    // length, the empty-Disallow idiom, a comment), parseRobots
    // lifts the directives into host-anchored prefix rules, and
    // q226's decision machinery scores every crawled URL. Per target
    // host: link volume, allowed, denied — q226's report over rules
    // that came from TEXT instead of a hand-built table.
    "q238_robots_parse" -> ((s, dir) => {
      import graft.graph.WebGraph
      import s.implicits._
      val robots = (0 until 20).map { k =>
        val d = k % 10
        (s"d$k.example.com",
          s"User-agent: *\nDisallow: /p/$d\nAllow: /p/$d$d\n" +
            "Disallow:\n# note")
      }.toDF("host", "txt")
      val rules = WebGraph.parseRobots(robots, "host", "txt")
      val links = WebGraph.links(Round11bQueries.linkedPages(s, dir),
        "doc_id", "html")
      val dec = WebGraph.urlDecisions(links.select(col("url")), rules)
      links.join(dec, Seq("url"))
        .groupBy(WebGraph.host(col("url")).as("dst_host"))
        .agg(count(lit(1)).as("n_links"),
          sum(when(col("action") === "allow", 1).otherwise(0))
            .cast("long").as("n_allowed"),
          sum(when(col("action") === "deny", 1).otherwise(0))
            .cast("long").as("n_denied"))
        .orderBy(col("dst_host"))
    }),

    // HITS hubs & authorities over the crawled doc graph (5 rounds,
    // exact-integer normalization): the complementary axis to q208's
    // PageRank — directory pages score as hubs, destination pages as
    // authorities. Report = top 100 by authority with both scores and
    // the domain; the unrolled-CTE oracle replays every pull and
    // every truncating rescale bit-exactly.
    "q239_hits" -> ((s, dir) => {
      import graft.graph.WebGraph
      val nodes = Tables(s, dir, "documents")
        .select(col("doc_id").as("node"))
      val edges = WebGraph.docEdges(
        WebGraph.links(Round11bQueries.linkedPages(s, dir),
          "doc_id", "html"))
      WebGraph.hits(nodes, edges, rounds = 5)
        .select(col("node"), (col("node") % 20).as("dom"),
          col("hub"), col("auth"))
        .orderBy(col("auth").desc, col("node"))
        .limit(100)
    }),

    // The round-13 graph chain COMPOSED: messy pages → realistic
    // extraction (all quote forms + relatives) → canonical URL
    // identity → doc edges → converged PageRank with dangling
    // redistribution. This is the pipeline a real crawl runs; every
    // stage is one the reference-scale tests already verify alone,
    // and the oracle replays the whole composition in one statement.
    "q240_resolved_graph" -> ((s, dir) => {
      import graft.graph.WebGraph
      val links = WebGraph.resolvedLinks(realisticPages(s, dir),
        "doc_id", "url", "html")
      val edges = WebGraph.docEdges(
        links.select(col("src"),
          WebGraph.canonicalUrl(col("url")).as("url")))
      val nodes = Tables(s, dir, "documents")
        .select(col("doc_id").as("node"))
      WebGraph.pageRankConverged(nodes, edges,
          maxRounds = 25, epsDiv = 100000L)
        .select(col("node"), (col("node") % 20).as("dom"),
          col("rank"), col("rounds"))
        .orderBy(col("rank").desc, col("node"))
        .limit(100)
    }),
  )

  val oracleSql: Map[String, String] = Map(

    // bpeCtes trains on the train slice; the held-out dictionary runs
    // the SAME 12 merge replaces (hw chain — apply is replay of the
    // frozen b(i) rows, exactly Bpe.segment's literal-replace
    // semantics on words the trainer never saw); the vocab id is
    // ROW_NUMBER() (1-based = the reserveUnk shift), OOV coalesces
    // to 0.
    "q232_unk_free_export" -> {
      val sep = "chr(31)"
      val applyRounds = (1 to Round7Queries.BpeK).map { i =>
        s"""hw$i AS MATERIALIZED (SELECT word, replace(seg,
           |    (SELECT $sep || lhs || $sep || $sep || rhs || $sep FROM b$i),
           |    (SELECT $sep || lhs || rhs || $sep FROM b$i)) AS seg
           |  FROM hw${i - 1})""".stripMargin
      }.mkString(",\n")
      s"""WITH trainc AS MATERIALIZED (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
         |heldc AS MATERIALIZED (
         |  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
         |  UNION ALL SELECT 9999991, '$PlantedHeldOut'),
         |${Round7Queries.bpeCtes(Round7Queries.BpeK, "trainc")},
         |dtt AS (SELECT doc_id, $toksExpr AS ts FROM trainc),
         |dwt AS (SELECT doc_id, ts[i] AS word
         |  FROM dtt, UNNEST(generate_series(1, len(ts))) AS u(i)),
         |syt AS (SELECT unnest(list_filter(
         |    string_split(w.seg, $sep), x -> x <> '')) AS sym
         |  FROM dwt d JOIN w${Round7Queries.BpeK} w USING (word)),
         |vc AS (SELECT sym AS token, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM syt GROUP BY sym),
         |vid AS (SELECT token,
         |    ROW_NUMBER() OVER (ORDER BY n DESC, token) AS vid
         |  FROM vc),
         |hw0 AS MATERIALIZED (
         |  SELECT word,
         |    list_reduce(list_transform(generate_series(1, length(word)),
         |      i -> $sep || word[i] || $sep), (a, b) -> a || b) AS seg
         |  FROM (SELECT DISTINCT unnest($toksExpr) AS word FROM heldc)),
         |$applyRounds,
         |dth AS (SELECT doc_id, $toksExpr AS ts FROM heldc),
         |dwh AS (SELECT doc_id, i AS wpos, ts[i] AS word
         |  FROM dth, UNNEST(generate_series(1, len(ts))) AS u(i)),
         |wsh AS (SELECT d.doc_id, d.wpos,
         |    list_filter(string_split(h.seg, $sep), x -> x <> '') AS syms
         |  FROM dwh d JOIN hw${Round7Queries.BpeK} h USING (word)),
         |syh AS (SELECT doc_id, wpos, j AS spos, syms[j] AS sym
         |  FROM wsh, UNNEST(generate_series(1, len(syms))) AS u(j)),
         |g AS (SELECT doc_id, sym,
         |    ROW_NUMBER() OVER (PARTITION BY doc_id
         |      ORDER BY wpos, spos) - 1 AS gpos
         |  FROM syh),
         |cnt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok
         |  FROM g GROUP BY doc_id),
         |p AS (SELECT doc_id, doc_id % 8 AS grp, n_tok,
         |    CAST(SUM(n_tok) OVER (PARTITION BY doc_id % 8
         |      ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) - n_tok AS start_tok
         |  FROM cnt),
         |tok AS (SELECT p.grp, (p.start_tok + g.gpos) // 2048 AS seq,
         |    (p.start_tok + g.gpos) % 2048 AS off,
         |    COALESCE(v.vid, 0) AS tid
         |  FROM g JOIN p USING (doc_id)
         |  LEFT JOIN vid v ON v.token = g.sym)
         |SELECT grp, seq, CAST(COUNT(*) AS BIGINT) AS n_tok,
         |  CAST(SUM((off + 1) * tid) AS BIGINT) AS tok_wsum,
         |  CAST(SUM(CASE WHEN tid = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_unk,
         |  CAST(MIN(tid) AS BIGINT) AS min_tid
         |FROM tok GROUP BY grp, seq ORDER BY grp, seq""".stripMargin
    },

    "q233_link_resolution" ->
      s"""WITH $rlpagesCte,
         |${graft.graph.WebGraph.resolvedLinksCtes(
             "rlpages", "doc_id", "url", "html")},
         |rcanon AS (SELECT src, url,
         |    ${graft.graph.WebGraph.canonicalUrlSql("url")} AS canon
         |  FROM rlinks),
         |rlagg AS (SELECT src % 20 AS src_dom,
         |    CAST(COUNT(*) AS BIGINT) AS n_resolved,
         |    CAST(COUNT(DISTINCT url) AS BIGINT) AS n_raw,
         |    CAST(COUNT(DISTINCT canon) AS BIGINT) AS n_canon
         |  FROM rcanon GROUP BY 1),
         |redges AS (SELECT DISTINCT src,
         |    CAST(regexp_extract(canon, '/p/([0-9]+)$$', 1) AS BIGINT) AS dst
         |  FROM rcanon WHERE regexp_extract(canon, '/p/([0-9]+)$$', 1) <> ''),
         |reagg AS (SELECT src % 20 AS src_dom,
         |    CAST(COUNT(*) AS BIGINT) AS n_edges
         |  FROM redges GROUP BY 1)
         |SELECT l.src_dom, l.n_resolved, l.n_raw, l.n_canon,
         |  COALESCE(e.n_edges, 0) AS n_edges
         |FROM rlagg l LEFT JOIN reagg e USING (src_dom)
         |ORDER BY l.src_dom""".stripMargin,

    "q234_pagerank_converged" ->
      s"""WITH ${Round11bQueries.lpagesCte},
         |${Round11bQueries.linkCtes},
         |cedges AS (SELECT src, dst FROM ledges WHERE src % 4 <> 0),
         |${graft.graph.WebGraph.pageRankConvergedCtes(
             "documents", "doc_id", "cedges", 25, 100000L)}
         |SELECT node, node % 20 AS dom, rank,
         |  (SELECT k FROM wcstop) AS rounds
         |FROM wcall WHERE k = (SELECT k FROM wcstop)
         |ORDER BY rank DESC, node LIMIT 100""".stripMargin,

    // q136's ADC chain + exact re-rank (the TVF's one logical plan)
    // as the approx side, brute-force exact as the truth side, q231's
    // report tail. refineR = 100 is ivfPqTopKRefined's default — the
    // TVF's served configuration.
    "q235_ann_tvf_recall" -> {
      val dotSql = (a: String, b: String) =>
        s"list_reduce(list_transform(generate_series(1, len($a)), i -> $a[i] * $b[i]), (x,y) -> x+y)"
      s"""WITH ${Round5Queries.pqAdcCtesSql},
         |cand_r AS (SELECT q_id, n_id FROM (
         |  SELECT q_id, n_id,
         |    ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY s / sqrt(nq * nc) DESC, n_id ASC) AS rr
         |  FROM adc) t WHERE rr <= 100),
         |rs AS (SELECT c.q_id, c.n_id,
         |    ${dotSql("qe.e", "ne.e")}
         |      / sqrt(${dotSql("qe.e", "qe.e")} * ${dotSql("ne.e", "ne.e")})
         |      AS cosine
         |  FROM cand_r c
         |  JOIN emb qe ON qe.vec_id = c.q_id
         |  JOIN emb ne ON ne.vec_id = c.n_id),
         |tapprox AS (SELECT q_id, n_id, rank FROM (
         |  SELECT q_id, n_id,
         |    ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY cosine DESC, n_id ASC) AS rank
         |  FROM rs) t WHERE rank <= 10),
         |en AS (SELECT vec_id, e, ${dotSql("e", "e")} AS nrm FROM emb),
         |qn AS (SELECT vec_id AS q_id, e AS qe, nrm AS nq FROM en
         |  WHERE vec_id < 50),
         |ecos AS (SELECT q.q_id, c.vec_id AS n_id,
         |    ${dotSql("q.qe", "c.e")} / sqrt(q.nq * c.nrm) AS cosine
         |  FROM qn q JOIN en c ON c.vec_id <> q.q_id),
         |texact AS (SELECT q_id, n_id, rank FROM (
         |  SELECT q_id, n_id,
         |    ROW_NUMBER() OVER (PARTITION BY q_id
         |      ORDER BY cosine DESC, n_id ASC) AS rank
         |  FROM ecos) t WHERE rank <= 10),
         |ov AS (SELECT e.q_id, CAST(count(*) AS BIGINT) AS n_overlap
         |  FROM texact e JOIN tapprox a
         |    ON a.q_id = e.q_id AND a.n_id = e.n_id
         |  GROUP BY e.q_id),
         |rr AS (SELECT e.q_id,
         |    coalesce(CAST(1000000 AS BIGINT) // a.rank,
         |      CAST(0 AS BIGINT)) AS rr_ppm
         |  FROM (SELECT q_id, n_id FROM texact WHERE rank = 1) e
         |  LEFT JOIN tapprox a ON a.q_id = e.q_id AND a.n_id = e.n_id)
         |SELECT q.q_id,
         |  coalesce(o.n_overlap, CAST(0 AS BIGINT)) AS n_overlap,
         |  coalesce(o.n_overlap, CAST(0 AS BIGINT)) * 1000000 // 10 AS recall_ppm,
         |  coalesce(r.rr_ppm, CAST(0 AS BIGINT)) AS rr_ppm
         |FROM qn q LEFT JOIN ov o ON o.q_id = q.q_id
         |LEFT JOIN rr r ON r.q_id = q.q_id
         |ORDER BY q.q_id""".stripMargin
    },

    "q236_alter_table" ->
      s"""SELECT doc_id,
         |  CAST(length(text) AS BIGINT) AS text_len,
         |  CAST(length(text) AS BIGINT) AS old_len,
         |  CASE WHEN doc_id % 2 = 0 THEN 'en' END AS lang,
         |  CASE WHEN doc_id % 2 = 0 THEN CAST(length(text) * 2 AS BIGINT)
         |       ELSE CAST(0 AS BIGINT) END AS score
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q237_warm_rank" ->
      s"""WITH ${Round11bQueries.lpagesCte},
         |${Round11bQueries.linkCtes},
         |e1 AS (SELECT src, dst FROM ledges WHERE src % 3 <> 2),
         |${graft.graph.WebGraph.pageRankConvergedCtes(
             "documents", "doc_id", "e1", 20, 100000L, pfx = "wa")},
         |wprev AS (SELECT node, rank FROM waall
         |  WHERE k = (SELECT k FROM wastop)),
         |${graft.graph.WebGraph.pageRankConvergedCtes(
             "documents", "doc_id", "ledges", 20, 100000L, pfx = "wb",
             initRel = Some("wprev"))}
         |SELECT node, node % 20 AS dom, rank,
         |  (SELECT k FROM wbstop) AS rounds
         |FROM wball WHERE k = (SELECT k FROM wbstop)
         |ORDER BY rank DESC, node LIMIT 100""".stripMargin,

    "q238_robots_parse" ->
      s"""WITH ${Round11bQueries.lpagesCte},
         |llinks AS (${graft.graph.WebGraph.linksSql(
             "lpages", "doc_id", "html")}),
         |probotsrc AS (SELECT
         |    'd' || CAST(k AS VARCHAR) || '.example.com' AS host,
         |    'User-agent: *' || chr(10) ||
         |    'Disallow: /p/' || CAST(k % 10 AS VARCHAR) || chr(10) ||
         |    'Allow: /p/' || CAST(k % 10 AS VARCHAR) || CAST(k % 10 AS VARCHAR) || chr(10) ||
         |    'Disallow:' || chr(10) ||
         |    '# note' AS txt
         |  FROM (SELECT unnest(generate_series(0, 19)) AS k)),
         |${graft.graph.WebGraph.parseRobotsCtes(
             "probotsrc", "host", "txt")},
         |udist AS (SELECT DISTINCT url FROM llinks),
         |${graft.graph.WebGraph.urlDecisionsCtes("udist", "probots", "u")}
         |SELECT ${graft.graph.WebGraph.hostSql("l.url")} AS dst_host,
         |  CAST(count(*) AS BIGINT) AS n_links,
         |  CAST(SUM(CASE WHEN d.action = 'allow' THEN 1 ELSE 0 END) AS BIGINT) AS n_allowed,
         |  CAST(SUM(CASE WHEN d.action = 'deny' THEN 1 ELSE 0 END) AS BIGINT) AS n_denied
         |FROM llinks l JOIN udec d USING (url)
         |GROUP BY 1
         |ORDER BY dst_host""".stripMargin,

    "q239_hits" ->
      s"""WITH ${Round11bQueries.lpagesCte},
         |${Round11bQueries.linkCtes},
         |${graft.graph.WebGraph.hitsCtes(
             "documents", "doc_id", "ledges", 5)}
         |SELECT h.node, h.node % 20 AS dom, h.hub, a.auth
         |FROM whh5 h JOIN wha5 a ON a.node = h.node
         |ORDER BY a.auth DESC, h.node LIMIT 100""".stripMargin,

    "q240_resolved_graph" ->
      s"""WITH $rlpagesCte,
         |${graft.graph.WebGraph.resolvedLinksCtes(
             "rlpages", "doc_id", "url", "html")},
         |rced AS (SELECT DISTINCT src,
         |    CAST(regexp_extract(${graft.graph.WebGraph
               .canonicalUrlSql("url")}, '/p/([0-9]+)$$', 1) AS BIGINT)
         |      AS dst
         |  FROM rlinks
         |  WHERE regexp_extract(${graft.graph.WebGraph
               .canonicalUrlSql("url")}, '/p/([0-9]+)$$', 1) <> ''),
         |${graft.graph.WebGraph.pageRankConvergedCtes(
             "documents", "doc_id", "rced", 25, 100000L)}
         |SELECT node, node % 20 AS dom, rank,
         |  (SELECT k FROM wcstop) AS rounds
         |FROM wcall WHERE k = (SELECT k FROM wcstop)
         |ORDER BY rank DESC, node LIMIT 100""".stripMargin,
  )
}
