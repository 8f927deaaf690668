package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 continuation: the crawl-side companions the round-13 graph
  * family still lacked — sitemap parsing (the discovery side of
  * robots.txt), BFS crawl depth from a seed set (the hop-count quality
  * feature), the byte-fallback tokenizer artifact (the OTHER unk-free
  * contract next to q232's reserved `<unk>`), and host-scoped
  * boilerplate scrubbing (CCNet/RefinedWeb's per-site line dedup,
  * which global-df scrubbing q212 cannot express).
  *
  * Reference scope: nothing here maps to
  * /root/reference/SCD_script.txt — these are training-data-pipeline
  * operators the north star adds on top.
  */
object Round13bQueries {

  private def urlOf(t: Column): Column =
    concat(lit("http://d"), (t % 20).cast("string"),
      lit(".example.com/p/"), t.cast("string"))

  private def urlSqlOf(t: String): String =
    s"'http://d' || CAST(($t) % 20 AS VARCHAR) || '.example.com/p/' || CAST($t AS VARCHAR)"

  // ---- q244's per-host boilerplate plant ----------------------------
  // Host = the doc's domain (doc_id % 20). Three planted lines with
  // per-host frequencies chosen to straddle the 50% threshold:
  //   nav     (div-20 % 3 <> 1) → 2/3 of every host's docs → SCRUBBED
  //   sitemap (div-20 % 4 = 0)  → 1/4 of every host's docs → KEPT
  //     (host-frequent enough to tempt an absolute-df rule, under the
  //      fraction threshold)
  //   newsletter (div-20 % 11 = 0) → ~9% per host but corpus-global
  //     (~9% of ALL docs — a global absolute cap like q212's maxDf=8
  //      would scrub it; the host-relative rule keeps it) → KEPT
  // All three keys ride doc_id div 20: doc_ids within a host step by
  // 20, so doc_id % 4 would be CONSTANT per host (and % 20 IS the
  // host) — the div-20 index is the per-host enumeration that
  // decorrelates the plant from the host id.
  private[queries] def boilPages(s: SparkSession, dir: String)
      : DataFrame = {
    val k = (col("doc_id") % 20).cast("string")
    val j = expr("doc_id div 20")
    Tables(s, dir, "documents").select(col("doc_id"),
      concat(lit("d"), k, lit(".example.com")).as("host"),
      concat_ws("\n",
        when(j % 3 =!= 1, concat(lit("Home | About | News on d"), k)),
        col("text"),
        when(j % 4 === 0, concat(lit("Site map for d"), k)),
        when(j % 11 === 0, lit("Subscribe to our newsletter")))
        .as("ptext"))
  }

  private val boilPagesCte: String =
    """bdocs AS (SELECT doc_id,
      |    'd' || CAST(doc_id % 20 AS VARCHAR) || '.example.com' AS host,
      |    concat_ws(chr(10),
      |      CASE WHEN (doc_id // 20) % 3 <> 1 THEN 'Home | About | News on d' || CAST(doc_id % 20 AS VARCHAR) END,
      |      text,
      |      CASE WHEN (doc_id // 20) % 4 = 0 THEN 'Site map for d' || CAST(doc_id % 20 AS VARCHAR) END,
      |      CASE WHEN (doc_id // 20) % 11 = 0 THEN 'Subscribe to our newsletter' END) AS ptext
      |  FROM documents)""".stripMargin

  // ---- q245's repetition plants --------------------------------------
  // The corpus is single-line ~300-char docs, so the fine Gopher
  // signals are near-zero naturally; two exclusive plants (keyed on
  // doc_id div 20 — % 20 IS the source, the decorrelation rule) make
  // each gate observable:
  //   j%5==2 → 40-char prefix + a 6-token phrase repeated 4x (one
  //            line): top-{2,3,4}-gram and dup-5-gram fire, dup-line
  //            stays 0 (single line);
  //   j%3==0 → text + THREE identical ~59-char lines: dup_line_frac
  //            = 0.5 everywhere, dup_line_char_frac straddles 0.20
  //            with text length (118/(len+177)) — and the tripled
  //            line's own 5-grams legitimately fire dup5.
  private val RepPromo = "win a prize now click here "
  private val RepNav =
    "Breaking update from our network partners around the world"

  private[queries] def repPages(s: SparkSession, dir: String)
      : DataFrame = {
    val j = expr("doc_id div 20")
    Tables(s, dir, "documents").select(col("doc_id"),
      when(j % 5 === 2,
        concat(substring(col("text"), 1, 40), lit(" "),
          lit(RepPromo * 4)))
        .when(j % 3 === 0,
          concat_ws("\n", col("text"), lit(RepNav), lit(RepNav),
            lit(RepNav)))
        .otherwise(col("text")).as("ptext"))
  }

  private val repPagesCte: String =
    s"""rpdocs AS (SELECT doc_id,
       |    CASE WHEN (doc_id // 20) % 5 = 2
       |      THEN substr(text, 1, 40) || ' ' ||
       |        repeat('$RepPromo', 4)
       |    WHEN (doc_id // 20) % 3 = 0
       |      THEN text || chr(10) || '$RepNav' || chr(10) ||
       |        '$RepNav' || chr(10) || '$RepNav'
       |    ELSE text END AS ptext
       |  FROM documents)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // SITEMAP parse → coverage report: each host publishes a
    // sitemap.xml declaring 40% of its pages (doc_id % 5 < 2) with a
    // lastmod freshness hint; parseSitemaps lifts the <url> entries
    // into rows, and the report reconciles DECLARED urls against the
    // urls the crawl actually DISCOVERED via links (q207's corpus) —
    // the frontier-seeding comparison (sitemap-only urls are fetch
    // candidates links never surface; link-only urls are pages the
    // site forgot to declare). Per host: declared, link-discovered
    // (distinct), their overlap, and the newest lastmod.
    "q241_sitemap_parse" -> ((s, dir) => {
      import graft.graph.WebGraph
      val docs = Tables(s, dir, "documents").select(col("doc_id"))
      val entry = concat(lit("<url><loc>"), urlOf(col("doc_id")),
        lit("</loc><lastmod>2026-01-"),
        lpad((col("doc_id") % 28 + 1).cast("string"), 2, "0"),
        lit("</lastmod></url>"))
      // the XML assembly is per-host (20 rows out) — the model-sized
      // HOF exemption; the PARSER under test is per-row codegen
      val maps = docs.filter(col("doc_id") % 5 < 2)
        .select((col("doc_id") % 20).as("k"), col("doc_id"),
          entry.as("e"))
        .groupBy(col("k"))
        .agg(concat(lit("<urlset>"),
          array_join(transform(
            sort_array(collect_list(struct(col("doc_id"), col("e")))),
            x => x.getField("e")), ""),
          lit("</urlset>")).as("xml"))
        .select(concat(lit("d"), col("k").cast("string"),
          lit(".example.com")).as("host"), col("xml"))
      val sm = WebGraph.parseSitemaps(maps, "host", "xml")
      val linked = WebGraph.links(
          Round11bQueries.linkedPages(s, dir), "doc_id", "html")
        .select(WebGraph.host(col("url")).as("host"), col("url"))
        .distinct()
      val declAgg = sm.groupBy(col("host"))
        .agg(count(lit(1)).as("n_declared"),
          max(col("lastmod")).as("max_lastmod"))
      val linkAgg = linked.groupBy(col("host"))
        .agg(count(lit(1)).as("n_linked"))
      val bothAgg = sm.select(col("host"), col("url"))
        .join(linked, Seq("host", "url"))
        .groupBy(col("host")).agg(count(lit(1)).as("n_both"))
      val spine = docs.select(concat(lit("d"),
          (col("doc_id") % 20).cast("string"),
          lit(".example.com")).as("host")).distinct()
      spine.join(declAgg, Seq("host"), "left")
        .join(linkAgg, Seq("host"), "left")
        .join(bothAgg, Seq("host"), "left")
        .select(col("host"),
          coalesce(col("n_declared"), lit(0L)).as("n_declared"),
          coalesce(col("n_linked"), lit(0L)).as("n_linked"),
          coalesce(col("n_both"), lit(0L)).as("n_both"),
          coalesce(col("max_lastmod"), lit("")).as("max_lastmod"))
        .orderBy(col("host"))
    }),

    // CRAWL DEPTH: exact BFS hop distance from the trusted seed set
    // (doc_id % 97 = 0) over the crawled doc graph — the hop-count
    // quality feature (TrustRank's intuition as a depth, pages far
    // from every seed skew spam). Frontier-only expansion: each edge
    // is expanded exactly once across the whole run. Report: docs per
    // (domain, depth), −1 = unreached within 6 hops.
    "q242_crawl_depth" -> ((s, dir) => {
      import graft.graph.WebGraph
      val nodes = Tables(s, dir, "documents")
        .select(col("doc_id").as("node"))
      val edges = WebGraph.docEdges(
        WebGraph.links(Round11bQueries.linkedPages(s, dir),
          "doc_id", "html"))
      val seeds = nodes.filter(col("node") % 97 === 0)
      WebGraph.hopDistance(nodes, edges, seeds, maxHops = 6)
        .groupBy((col("node") % 20).as("dom"), col("dist"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("dom"), col("dist"))
    }),

    // BYTE-FALLBACK export — q232's held-out encoding under the OTHER
    // unk-free contract: instead of collapsing OOV tokens onto one
    // reserved <unk>, each OOV symbol DECOMPOSES into reserved byte
    // pieces (ids 0–255; trained ids shift +256, SentencePiece's
    // byte_fallback layout), so the tape is non-negative AND lossless
    // — the planted x/z words round-trip as bytes instead of
    // flattening to a single id. Output per sequence: checksum, the
    // byte-piece count (the fallback actually fired), and the
    // tape-wide min id read back from the published artifact.
    "q243_byte_fallback" -> ((s, dir) => {
      import java.nio.file.Files
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"))
      val train = docs.filter(col("doc_id") % 3 =!= 0)
      import s.implicits._
      val held = docs.filter(col("doc_id") % 3 === 0)
        .unionByName(Seq((9999991L, Round13Queries.PlantedHeldOut))
          .toDF("doc_id", "text"))
      val merges = graft.text.Bpe.trainMerges(train, "text",
        Round7Queries.BpeK)
      val voc = graft.text.Bpe.vocab(train, "text", merges)
      val stream = graft.pipeline.Packing.byteFallbackStream(
        graft.text.Bpe.symbolStream(held, "doc_id", "text", merges),
        "doc_id", voc)
      val root = Files.createTempDirectory("graft-q243").toString
      val cat = new graft.catalog.ParquetCatalog(s, root)
      graft.pipeline.Packing.exportShardsOf("doc_id", stream, cat,
        "shards", seqLen = 2048, numGroups = 8,
        vocabIds = Some(graft.pipeline.Packing.reserveBytes(voc)))
      val (bin, _) = graft.pipeline.Packing.readShards(cat, "shards")
      // per-sequence HOF lambdas are bounded (≤ 2048 elements) — the
      // per-doc exemption, not a corpus-sized CodegenFallback path
      val out = bin
        .select(col("grp"), col("seq"), col("n_tok"),
          graft.functions.TokenBinary.weightedSumCol(col("tokens"))
            .as("tok_wsum"),
          size(filter(
            graft.functions.TokenBinary.unpackCol(col("tokens")),
            t => t < 256)).cast("long").as("n_byte"),
          array_min(
            graft.functions.TokenBinary.unpackCol(col("tokens")))
            .cast("long").as("min_tid"))
        .orderBy(col("grp"), col("seq"))
        .localCheckpoint()
      Round7bQueries.rmTree(root)
      out
    }),

    // HOST-scoped boilerplate scrub: per-site line dedup with a
    // host-RELATIVE threshold (≥ 50% of the host's docs, floor df 2).
    // The plant makes the semantics observable: the 2/3-frequency nav
    // line scrubs on every host, the 1/4-frequency site-map line
    // survives (fraction, not presence), and the corpus-global
    // newsletter line survives everywhere (its ~9% per-host rate is
    // under threshold even though its GLOBAL df would trip q212's
    // absolute cap ~1000-fold).
    "q244_host_boilerplate" -> ((s, dir) => {
      graft.dedup.Dedup.scrubHostBoilerplate(boilPages(s, dir),
          "doc_id", "host", "ptext", minPpm = 500000L, minDf = 2L)
        .orderBy(col("doc_id"))
    }),

    // FINE-GRAINED Gopher repetition report (Rae et al. Table A1):
    // duplicate-line fraction + char fraction, heaviest-duplicated
    // {2,3,4}-gram char mass, duplicate-5-gram char COVERAGE (each
    // position counted once), and the six-way OR gate — the per-doc
    // repetition family q90's coarse pair (top bigram + unique frac)
    // doesn't cover. Exact integer counts, one double division each.
    "q245_fine_repetition" -> ((s, dir) => {
      graft.text.Repetition.fineSignals(repPages(s, dir),
          "doc_id", "ptext")
        .orderBy(col("doc_id"))
    }),
  )

  val oracleSql: Map[String, String] = Map(

    "q241_sitemap_parse" ->
      s"""WITH ${Round11bQueries.lpagesCte},
         |llinks AS (${graft.graph.WebGraph.linksSql(
             "lpages", "doc_id", "html")}),
         |smdecl AS (SELECT doc_id % 20 AS k, doc_id,
         |    '<url><loc>' ||
         |    ${urlSqlOf("doc_id")} ||
         |    '</loc><lastmod>2026-01-' ||
         |    lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') ||
         |    '</lastmod></url>' AS e
         |  FROM documents WHERE doc_id % 5 < 2),
         |smxml AS (SELECT
         |    'd' || CAST(k AS VARCHAR) || '.example.com' AS host,
         |    '<urlset>' || string_agg(e, '' ORDER BY doc_id) ||
         |    '</urlset>' AS xml
         |  FROM smdecl GROUP BY k),
         |${graft.graph.WebGraph.parseSitemapsCtes(
             "smxml", "host", "xml")},
         |smlinked AS (SELECT DISTINCT
         |    ${graft.graph.WebGraph.hostSql("url")} AS host, url
         |  FROM llinks),
         |smda AS (SELECT host, CAST(count(*) AS BIGINT) AS n_declared,
         |    MAX(lastmod) AS max_lastmod
         |  FROM psmaps GROUP BY host),
         |smla AS (SELECT host, CAST(count(*) AS BIGINT) AS n_linked
         |  FROM smlinked GROUP BY host),
         |smba AS (SELECT d.host, CAST(count(*) AS BIGINT) AS n_both
         |  FROM psmaps d JOIN smlinked l
         |    ON l.host = d.host AND l.url = d.url
         |  GROUP BY d.host),
         |smspine AS (SELECT DISTINCT
         |    'd' || CAST(doc_id % 20 AS VARCHAR) || '.example.com' AS host
         |  FROM documents)
         |SELECT s.host,
         |  coalesce(d.n_declared, CAST(0 AS BIGINT)) AS n_declared,
         |  coalesce(l.n_linked, CAST(0 AS BIGINT)) AS n_linked,
         |  coalesce(b.n_both, CAST(0 AS BIGINT)) AS n_both,
         |  coalesce(d.max_lastmod, '') AS max_lastmod
         |FROM smspine s
         |LEFT JOIN smda d ON d.host = s.host
         |LEFT JOIN smla l ON l.host = s.host
         |LEFT JOIN smba b ON b.host = s.host
         |ORDER BY s.host""".stripMargin,

    "q242_crawl_depth" ->
      s"""WITH ${Round11bQueries.lpagesCte},
         |${Round11bQueries.linkCtes},
         |hseeds AS (SELECT doc_id AS node FROM documents
         |  WHERE doc_id % 97 = 0),
         |${graft.graph.WebGraph.hopDistanceCtes(
             "documents", "doc_id", "ledges", "hseeds", 6)}
         |SELECT node % 20 AS dom, dist,
         |  CAST(count(*) AS BIGINT) AS n_docs
         |FROM hddist GROUP BY 1, 2
         |ORDER BY dom, dist""".stripMargin,

    // q232's oracle chain up to the segmented held-out symbols (syh),
    // then the byte-fallback id assignment: in-vocab syms take
    // vid + 255 (the 1-based ROW_NUMBER re-based by +256 onto 0-based
    // trained ids), OOV syms explode into per-char byte ids via ord().
    "q243_byte_fallback" -> {
      val sep = "chr(31)"
      val toksExpr =
        """list_filter(string_split_regex(text, '\s+'), x -> x <> '')"""
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
         |  UNION ALL SELECT 9999991, '${Round13Queries.PlantedHeldOut}'),
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
         |bfin AS (SELECT s.doc_id, s.wpos, s.spos, 0 AS cpos,
         |    v.vid + 255 AS tid
         |  FROM syh s JOIN vid v ON v.token = s.sym),
         |bfoov AS (SELECT s.doc_id, s.wpos, s.spos, j AS cpos,
         |    ord(s.sym[j]) AS tid
         |  FROM (SELECT y.doc_id, y.wpos, y.spos, y.sym FROM syh y
         |    LEFT JOIN vid v ON v.token = y.sym
         |    WHERE v.token IS NULL) s,
         |  UNNEST(generate_series(1, length(s.sym))) AS u(j)),
         |bg AS (SELECT doc_id, tid,
         |    ROW_NUMBER() OVER (PARTITION BY doc_id
         |      ORDER BY wpos, spos, cpos) - 1 AS gpos
         |  FROM (SELECT * FROM bfin UNION ALL SELECT * FROM bfoov) t),
         |bcnt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok
         |  FROM bg GROUP BY doc_id),
         |bp AS (SELECT doc_id, doc_id % 8 AS grp, n_tok,
         |    CAST(SUM(n_tok) OVER (PARTITION BY doc_id % 8
         |      ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) - n_tok AS start_tok
         |  FROM bcnt),
         |btok AS (SELECT p.grp, (p.start_tok + g.gpos) // 2048 AS seq,
         |    (p.start_tok + g.gpos) % 2048 AS off, g.tid
         |  FROM bg g JOIN bp p USING (doc_id))
         |SELECT grp, seq, CAST(COUNT(*) AS BIGINT) AS n_tok,
         |  CAST(SUM((off + 1) * tid) AS BIGINT) AS tok_wsum,
         |  CAST(SUM(CASE WHEN tid < 256 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_byte,
         |  CAST(MIN(tid) AS BIGINT) AS min_tid
         |FROM btok GROUP BY grp, seq ORDER BY grp, seq""".stripMargin
    },

    "q244_host_boilerplate" ->
      s"""WITH $boilPagesCte,
         |bpr0 AS (SELECT doc_id, host,
         |    string_split(ptext, chr(10)) AS ps FROM bdocs),
         |bpr AS (SELECT doc_id, host,
         |    unnest(generate_series(1, len(ps))) AS pos,
         |    unnest(ps) AS para FROM bpr0),
         |bpn AS (SELECT doc_id, host, pos, para,
         |    ${graft.functions.PortableHash.hash60BaseSql("para")} AS ph
         |  FROM bpr WHERE length(trim(para)) > 0),
         |bhn AS (SELECT host, CAST(count(*) AS BIGINT) AS hn
         |  FROM bdocs GROUP BY host),
         |bdf AS (SELECT host, ph, CAST(count(*) AS BIGINT) AS pdf
         |  FROM (SELECT DISTINCT doc_id, host, ph FROM bpn) t
         |  GROUP BY host, ph),
         |bboil AS (SELECT d.host, d.ph
         |  FROM bdf d JOIN bhn h USING (host)
         |  WHERE d.pdf >= 2 AND d.pdf * 1000000 >= 500000 * h.hn),
         |bpd AS (SELECT n.doc_id,
         |    CAST(count(*) AS BIGINT) AS n_paras,
         |    CAST(coalesce(count(*) FILTER (WHERE b.ph IS NOT NULL), 0)
         |      AS BIGINT) AS n_dropped,
         |    string_agg(n.para, chr(10) ORDER BY n.pos)
         |      FILTER (WHERE b.ph IS NULL) AS clean_text
         |  FROM bpn n LEFT JOIN bboil b
         |    ON b.host = n.host AND b.ph = n.ph
         |  GROUP BY n.doc_id)
         |SELECT d.doc_id, d.host,
         |  coalesce(p.clean_text, '') AS clean_text,
         |  coalesce(p.n_paras, CAST(0 AS BIGINT)) AS n_paras,
         |  coalesce(p.n_dropped, CAST(0 AS BIGINT)) AS n_dropped
         |FROM bdocs d LEFT JOIN bpd p ON p.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    // Gram keys join tokens with chr(31) (concatenation without a
    // separator would alias "ab c" with "a bc"); char masses count
    // token characters only. Every fraction is one BIGINT/BIGINT
    // double division behind a den>0 guard — bit-identical on both
    // engines.
    "q245_fine_repetition" ->
      s"""WITH $repPagesCte,
         |rl AS (SELECT doc_id, line, CAST(length(line) AS BIGINT) AS len
         |  FROM (SELECT doc_id,
         |      unnest(string_split(ptext, chr(10))) AS line FROM rpdocs) t
         |  WHERE length(trim(line)) > 0),
         |rlg AS (SELECT doc_id, line, CAST(count(*) AS BIGINT) AS c,
         |    MAX(len) AS len
         |  FROM rl GROUP BY doc_id, line),
         |rld AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_lines,
         |    CAST(count(*) AS BIGINT) AS n_dl,
         |    CAST(SUM(c * len) AS BIGINT) AS line_chars,
         |    CAST(SUM((c - 1) * len) AS BIGINT) AS dup_line_chars
         |  FROM rlg GROUP BY doc_id),
         |rts AS MATERIALIZED (SELECT doc_id,
         |    list_filter(string_split_regex(ptext, '\\s+'),
         |      x -> x <> '') AS ts
         |  FROM rpdocs),
         |rtk AS MATERIALIZED (SELECT doc_id, i AS pos, ts[i] AS tok,
         |    CAST(length(ts[i]) AS BIGINT) AS len
         |  FROM rts, UNNEST(generate_series(1, len(ts))) AS u(i)),
         |rtd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
         |    CAST(SUM(len) AS BIGINT) AS n_chars
         |  FROM rtk GROUP BY doc_id),
         |rg234 AS (
         |  SELECT doc_id, 2 AS n, ts[i] || chr(31) || ts[i+1] AS gram,
         |      CAST(length(ts[i]) + length(ts[i+1]) AS BIGINT) AS glen
         |    FROM rts, UNNEST(generate_series(1, len(ts) - 1)) AS u(i)
         |  UNION ALL
         |  SELECT doc_id, 3, ts[i] || chr(31) || ts[i+1] || chr(31) ||
         |      ts[i+2],
         |      CAST(length(ts[i]) + length(ts[i+1]) + length(ts[i+2])
         |        AS BIGINT)
         |    FROM rts, UNNEST(generate_series(1, len(ts) - 2)) AS u(i)
         |  UNION ALL
         |  SELECT doc_id, 4, ts[i] || chr(31) || ts[i+1] || chr(31) ||
         |      ts[i+2] || chr(31) || ts[i+3],
         |      CAST(length(ts[i]) + length(ts[i+1]) + length(ts[i+2]) +
         |        length(ts[i+3]) AS BIGINT)
         |    FROM rts, UNNEST(generate_series(1, len(ts) - 3)) AS u(i)),
         |rtm AS (SELECT doc_id,
         |    MAX(CASE WHEN n = 2 THEN mass END) AS m2,
         |    MAX(CASE WHEN n = 3 THEN mass END) AS m3,
         |    MAX(CASE WHEN n = 4 THEN mass END) AS m4
         |  FROM (SELECT doc_id, n, gram,
         |      CAST(count(*) AS BIGINT) * MAX(glen) AS mass
         |    FROM rg234 GROUP BY doc_id, n, gram
         |    HAVING count(*) >= 2) g
         |  GROUP BY doc_id),
         |rg5 AS MATERIALIZED (SELECT doc_id, i AS pos,
         |    ts[i] || chr(31) || ts[i+1] || chr(31) || ts[i+2] ||
         |    chr(31) || ts[i+3] || chr(31) || ts[i+4] AS g5
         |  FROM rts, UNNEST(generate_series(1, len(ts) - 4)) AS u(i)),
         |rg5d AS (SELECT doc_id, g5 FROM rg5
         |  GROUP BY doc_id, g5 HAVING count(*) >= 2),
         |rg5c AS (SELECT DISTINCT r.doc_id, r.pos + o AS cpos
         |  FROM rg5 r JOIN rg5d d ON d.doc_id = r.doc_id AND d.g5 = r.g5,
         |  UNNEST(generate_series(0, 4)) AS v(o)),
         |rg5s AS (SELECT c.doc_id, CAST(SUM(t.len) AS BIGINT) AS dup5_chars
         |  FROM rg5c c JOIN rtk t
         |    ON t.doc_id = c.doc_id AND t.pos = c.cpos
         |  GROUP BY c.doc_id),
         |rfr AS (SELECT d.doc_id,
         |    coalesce(l.n_lines, CAST(0 AS BIGINT)) AS n_lines,
         |    coalesce(k.n_tok, CAST(0 AS BIGINT)) AS n_tok,
         |    CASE WHEN coalesce(l.n_lines, 0) > 0 THEN
         |      CAST(coalesce(l.n_lines, 0) - coalesce(l.n_dl, 0) AS DOUBLE)
         |        / CAST(coalesce(l.n_lines, 0) AS DOUBLE)
         |    ELSE 0.0 END AS dup_line_frac,
         |    CASE WHEN coalesce(l.line_chars, 0) > 0 THEN
         |      CAST(coalesce(l.dup_line_chars, 0) AS DOUBLE)
         |        / CAST(coalesce(l.line_chars, 0) AS DOUBLE)
         |    ELSE 0.0 END AS dup_line_char_frac,
         |    CASE WHEN coalesce(k.n_chars, 0) > 0 THEN
         |      CAST(coalesce(m.m2, 0) AS DOUBLE)
         |        / CAST(coalesce(k.n_chars, 0) AS DOUBLE)
         |    ELSE 0.0 END AS top2_char_frac,
         |    CASE WHEN coalesce(k.n_chars, 0) > 0 THEN
         |      CAST(coalesce(m.m3, 0) AS DOUBLE)
         |        / CAST(coalesce(k.n_chars, 0) AS DOUBLE)
         |    ELSE 0.0 END AS top3_char_frac,
         |    CASE WHEN coalesce(k.n_chars, 0) > 0 THEN
         |      CAST(coalesce(m.m4, 0) AS DOUBLE)
         |        / CAST(coalesce(k.n_chars, 0) AS DOUBLE)
         |    ELSE 0.0 END AS top4_char_frac,
         |    CASE WHEN coalesce(k.n_chars, 0) > 0 THEN
         |      CAST(coalesce(s.dup5_chars, 0) AS DOUBLE)
         |        / CAST(coalesce(k.n_chars, 0) AS DOUBLE)
         |    ELSE 0.0 END AS dup5_char_frac
         |  FROM rpdocs d
         |  LEFT JOIN rld l ON l.doc_id = d.doc_id
         |  LEFT JOIN rtd k ON k.doc_id = d.doc_id
         |  LEFT JOIN rtm m ON m.doc_id = d.doc_id
         |  LEFT JOIN rg5s s ON s.doc_id = d.doc_id)
         |SELECT doc_id, n_lines, n_tok, dup_line_frac,
         |  dup_line_char_frac, top2_char_frac, top3_char_frac,
         |  top4_char_frac, dup5_char_frac,
         |  (dup_line_frac > 0.30 OR dup_line_char_frac > 0.20 OR
         |   top2_char_frac > 0.20 OR top3_char_frac > 0.18 OR
         |   top4_char_frac > 0.16 OR dup5_char_frac > 0.15)
         |    AS repetitive_fine
         |FROM rfr ORDER BY doc_id""".stripMargin,
  )
}
