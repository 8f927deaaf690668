package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-17: HTTP revalidation completed (ETag/If-None-Match q279,
  * `Content-Encoding: deflate` q280), arbitrary-depth sitemap trees
  * (q281), schema-evolution DDL completed (DROP/RENAME COLUMN q282),
  * JPEG restart markers (q283), and the trained char-trigram
  * language gate (q284/q285).
  *
  * Reference scope: nothing here maps to
  * /root/reference/SCD_script.txt — these extend the crawl-ingest and
  * text-quality families the north star adds on top.
  */
object Round17Queries {

  private def urlOf(t: Column): Column =
    concat(lit("http://d"), (t % 20).cast("string"),
      lit(".example.com/p/"), t.cast("string"))

  private def urlSqlOf(t: String): String =
    s"'http://d' || CAST(($t) % 20 AS VARCHAR) || '.example.com/p/' || CAST($t AS VARCHAR)"

  /** Substitution cipher over the corpus alphabet a–y (reversed):
    * statistically a different "language" — every character trigram
    * changes — while length/punctuation stay identical, so the
    * quality gate keeps it and only a LANGUAGE gate can see it.
    */
  private def cipher(t: Column): Column =
    translate(t, "abcdefghijklmnopqrstuvwxy", "yxwvutsrqponmlkjihgfedcba")

  private val CipherSql =
    "translate(text, 'abcdefghijklmnopqrstuvwxy', 'yxwvutsrqponmlkjihgfedcba')"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ETag / If-None-Match — the OTHER half of HTTP revalidation:
    // q275's scheduler (sitemap freshness delta → wildcard robots →
    // politeness slots) drives the fetches, but the 304 decision is
    // now CONTENT-ADDRESSED — the server compares the client's
    // If-None-Match validator (the stored copy's md5) against the
    // current entity's etag. The spurious-lastmod class (id%3==0 ∧
    // id%7==2: sitemap bumped, content identical) is scheduled
    // BECAUSE its lastmod lies, and saved by the etag — under
    // If-Modified-Since alone every scheduled stored URL would
    // re-transfer its body. 200s and 304s both carry the current
    // ETag header; n_etag_clean proves the transported validator
    // equals the truth's md5 for every scheduled URL.
    "q279_etag_fetch" -> ((s, dir) => {
      import java.nio.file.Files
      import graft.graph.WebGraph
      import graft.sources.Warc
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"))
      val t = col("doc_id")
      val j5 = expr("doc_id div 20") % 5
      val j6 = expr("doc_id div 20") % 6
      val day0 = (t * 7) % 28 + 1
      val dayN = day0 + when(t % 3 === 0, 1).otherwise(0)
      def dstr(d: Column) =
        concat(lit("2025-01-"), lpad(d.cast("string"), 2, "0"))
      val host = concat(lit("d"), (t % 20).cast("string"),
        lit(".example.com"))
      val entries = docs.filter(j6 =!= 5)
        .select(host.as("host"),
          concat(lit("<url><loc>"), urlOf(t), lit("</loc><lastmod>"),
            dstr(dayN), lit("</lastmod></url>")).as("e"))
      val maps = entries.groupBy(col("host"))
        .agg(concat_ws("", collect_list(col("e"))).as("xml"))
      val inv = WebGraph.parseSitemaps(maps, "host", "xml")
        .select(col("url"), col("lastmod"))
      // crawl state: stored body + its lastmod + its VALIDATOR (etag)
      val state = docs.filter(j5 =!= 4)
        .select(urlOf(t).as("url"), col("text").as("stored"),
          dstr(day0).as("stored_lastmod"),
          md5(col("text")).as("stored_etag"))
      val cand = inv.join(state.select(col("url"),
          col("stored_lastmod")), Seq("url"), "left")
        .filter(col("stored_lastmod").isNull ||
          col("lastmod") > col("stored_lastmod"))
        .select(col("url"), col("lastmod"),
          (regexp_extract(col("url"), "/p/([0-9]+)$", 1).cast("long")
            % 20).as("dom"))
      val robots = (0 until 20).map { k =>
        (s"d$k.example.com",
          s"User-agent: *\nDisallow: /*9$$\nDisallow: /p/2\n" +
            s"Crawl-delay: ${(k % 4) * 5 + 5}")
      }.toDF("host", "txt")
      val rules = WebGraph.parseRobotsFor(robots, "host", "txt",
        "graftbot")
      val delays = WebGraph.crawlDelays(robots, "host", "txt",
        "graftbot")
      val dec = WebGraph.urlDecisions(cand.select(col("url")), rules)
      val sched = cand.join(dec, Seq("url"))
        .filter(col("action") === "allow")
        .withColumn("host", concat(lit("d"), col("dom").cast("string"),
          lit(".example.com")))
        .join(broadcast(delays), Seq("host"), "left")
        .withColumn("slots",
          greatest(lit(1L), expr("60 div coalesce(delay, 60)")))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("host"))
            .orderBy(col("lastmod").desc, col("url"))))
        .filter(col("rk") <= col("slots"))
        .select(col("url"))
      val fetchSet = sched
        .select(col("url"), regexp_extract(col("url"), "/p/([0-9]+)$", 1)
          .cast("long").as("doc_id"))
        .join(docs, Seq("doc_id"))
        .join(state.select(col("url"), col("stored_etag")),
          Seq("url"), "left")
      val changed = col("doc_id") % 3 === 0 && col("doc_id") % 7 =!= 2
      val cur = when(changed, concat(col("text"), lit(" v2")))
        .otherwise(col("text"))
      val curEtag = md5(cur)
      // the server's 304 test IS the validator compare (NULL validator
      // — never stored — falls through to 200)
      val pages = fetchSet.select(col("doc_id"), col("url").as("uri"),
        when(col("stored_etag") === curEtag,
          Warc.httpResponseEtag(lit(304), lit("text/html"), curEtag,
            lit("")))
          .otherwise(Warc.httpResponseEtag(lit(200), lit("text/html"),
            curEtag, cur)).as("payload"))
      val land = Files.createTempDirectory("graft-q279-warc").toString
      Warc.writeSegments(pages.repartition(4, col("doc_id")),
        "uri", "payload", land, gzip = true)
      val back = Warc.readRecords(s, land)
        .select(col("uri").as("url"),
          regexp_extract(col("uri"), "/p/([0-9]+)$", 1)
            .cast("long").as("doc_id"),
          Warc.httpStatus(col("body")).as("st"),
          Warc.httpEtag(col("body")).as("etag"),
          Warc.httpBody(col("body")).as("fetched"))
      val truth = when(changed, concat(col("text"), lit(" v2")))
        .otherwise(col("text"))
      val eff = back
        .join(state.select(col("url"), col("stored")), Seq("url"), "left")
        .join(docs, Seq("doc_id"))
        .select(col("doc_id"), col("st"),
          (when(col("st") === 200, col("fetched"))
            .otherwise(col("stored")) === truth).as("cm"),
          (col("etag") === md5(truth)).as("em"),
          length(col("fetched")).cast("long").as("len_f"),
          length(coalesce(col("stored"), lit(""))).cast("long")
            .as("len_s"))
      val res = eff.groupBy((col("doc_id") % 20).as("dom"))
        .agg(count(lit(1)).as("n_scheduled"),
          sum(when(col("st") === 200, 1).otherwise(0)).cast("long")
            .as("n_200"),
          // every 304 here is a spurious-lastmod save: scheduled
          // stored URLs all have lastmod > stored, so IMS alone would
          // have re-fetched every one of these bodies
          sum(when(col("st") === 304, 1).otherwise(0)).cast("long")
            .as("n_304_etag"),
          sum(when(col("st") === 200, col("len_f")).otherwise(0L))
            .cast("long").as("bytes_fetched"),
          sum(when(col("st") === 304, col("len_s")).otherwise(0L))
            .cast("long").as("bytes_saved"),
          sum(when(col("cm"), 1).otherwise(0)).cast("long")
            .as("n_clean"),
          sum(when(col("em"), 1).otherwise(0)).cast("long")
            .as("n_etag_clean"))
        .orderBy(col("dom"))
        .localCheckpoint()
      Round7bQueries.rmTree(land)
      res
    }),

    // Content-Encoding: deflate — RFC 9110 says zlib-wrapped, the
    // wild tail sends RAW deflate under the SAME label; the reader
    // does what browsers do (zlib first, raw fallback) through ONE
    // expression. Four transport classes (identity / gzip / zlib
    // deflate / raw deflate — the two deflate framings share the
    // 'deflate' label), accented text under utf-8 so the charset
    // decode is real; clean match proves byte-exactness through
    // compress → land → read → inflate → decode for every framing.
    "q280_deflate_bodies" -> ((s, dir) => {
      import java.nio.file.Files
      import graft.sources.Warc
      import graft.functions.Gzip
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"))
      val t = col("doc_id")
      val tr = translate(col("text"), "ae", "éä")
      val utf8 = encode(tr, "UTF-8")
      val k4 = t % 4
      val enc = when(k4 === 1, lit("gzip"))
        .when(k4 === 2 || k4 === 3, lit("deflate"))
        .otherwise(lit(""))
      val body = when(k4 === 1, Gzip.deflateCol(utf8))
        .when(k4 === 2, Gzip.deflateZlibCol(utf8))
        .when(k4 === 3, Gzip.deflateRawCol(utf8))
        .otherwise(utf8)
      val pages = docs.select(col("doc_id"),
        urlOf(t).as("uri"),
        Warc.httpResponseBytes(lit(200), lit("text/html"),
          lit("utf-8"), enc, body).as("payload"))
      val land = Files.createTempDirectory("graft-q280-warc").toString
      Warc.writeSegmentsBinary(pages.repartition(4, col("doc_id")),
        "uri", "payload", land, gzip = true)
      val back = Warc.readRecordsBinary(s, land)
        .select(regexp_extract(col("uri"), "/p/([0-9]+)$", 1)
          .cast("long").as("doc_id"),
          Warc.payloadText(col("body")).as("pt"),
          Warc.bodyBytes(col("body")).as("bb"))
      val ce = Warc.httpContentEncoding(col("pt"))
      val parsed = back.select(col("doc_id"), ce.as("enc"),
        Warc.decodeBody(
          when(ce === "gzip", Gzip.inflateCol(col("bb")))
            .when(ce === "deflate", Gzip.inflateDeflateCol(col("bb")))
            .otherwise(col("bb")),
          Warc.httpCharset(col("pt"))).as("decoded"))
      val res = parsed.join(docs, Seq("doc_id"))
        .select(col("doc_id"), col("enc"),
          (col("decoded") === translate(col("text"), "ae", "éä"))
            .as("cm"),
          length(col("decoded")).cast("long").as("nch"))
        .groupBy((col("doc_id") % 20).as("dom"))
        .agg(count(lit(1)).as("n_records"),
          sum(when(col("enc") === "gzip", 1).otherwise(0))
            .cast("long").as("n_gzip"),
          sum(when(col("enc") === "deflate", 1).otherwise(0))
            .cast("long").as("n_deflate"),
          sum(when(col("cm"), 1).otherwise(0)).cast("long")
            .as("n_clean"),
          sum(col("nch")).as("sum_chars"))
        .orderBy(col("dom"))
        .localCheckpoint()
      Round7bQueries.rmTree(land)
      res
    }),

    // ALTER TABLE DROP/RENAME COLUMN across the version chain — the
    // schema-evolution verbs q236's ADD left open: seed (with a tag
    // column) → ADD score DEFAULT 7 → RENAME text_len TO len_chars →
    // DROP tag — four atomic versions — then an UPDATE against the
    // POST-alter schema proves the new names are live. The report
    // joins the CURRENT content against the PRE-alter version read by
    // time travel (old_len/old_tag come from a snapshot whose schema
    // still has text_len and tag), so the query only works if every
    // version reads under its own schema.
    "q282_alter_columns" -> ((s, dir) => {
      import java.nio.file.Files
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"),
          length(col("text")).cast("long").as("text_len"),
          concat(lit("t"), (col("doc_id") % 3).cast("string")).as("tag"))
      val root = Files.createTempDirectory("graft-q282").toString
      val cat = new graft.catalog.ParquetCatalog(s, root)
      cat.create("dd", docs.schema)
      cat.overwrite("dd", docs)
      val v0 = cat.currentVersion("dd").get
      graft.scd.DdlSql.execute(s, cat,
        "ALTER TABLE dd ADD COLUMNS (score BIGINT DEFAULT 7)")
      graft.scd.DdlSql.execute(s, cat,
        "ALTER TABLE dd RENAME COLUMN text_len TO len_chars")
      graft.scd.DdlSql.execute(s, cat,
        "ALTER TABLE dd DROP COLUMN tag")
      graft.scd.DmlSql.execute(s, cat,
        "UPDATE dd SET score = len_chars * 3 WHERE doc_id % 2 = 1")
      val old = cat.tableAsOfVersion("dd", v0)
        .select(col("doc_id"), col("text_len").as("old_len"),
          col("tag").as("old_tag"))
      val out = cat.table("dd").join(old, Seq("doc_id"))
        .select(col("doc_id"), col("len_chars"), col("score"),
          col("old_len"), col("old_tag"))
        .orderBy(col("doc_id"))
        .localCheckpoint()
      Round7bQueries.rmTree(root)
      out
    }),

    // TRAINED language ID (fit/apply char-trigram classifier, exact
    // integers): half the corpus is substitution-ciphered — a
    // "language" the marker regex cannot name (its five stopwords per
    // language are destroyed; stray cipher artifacts like 'a'←'y'
    // even claim 'en') — 10% seed docs are labeled by construction,
    // and the trained model separates the two classes where the regex
    // argmax misclassifies. The oracle replays fit AND apply
    // bit-exactly (bitlen-integer costs, div, label tie-break) plus
    // the regex argmax, so both columns are exact counts, not
    // accuracy estimates.
    "q284_trained_langid" -> ((s, dir) => {
      import graft.text.LangClassifier
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"))
      val fx = docs.select(col("doc_id"),
        when(col("doc_id") % 2 === 0, col("text"))
          .otherwise(cipher(col("text"))).as("text"),
        when(col("doc_id") % 2 === 0, lit("en")).otherwise(lit("xx"))
          .as("lang_true"))
      val seeds = fx.filter(col("doc_id") % 10 === 0 ||
        col("doc_id") % 10 === 5)
      val model = LangClassifier.fit(seeds, "doc_id", "lang_true",
        "text")
      val pred = LangClassifier.classify(fx, "doc_id", "text", model)
      val res = fx
        .join(pred.select(col("doc_id"), col("lang_trained")),
          Seq("doc_id"))
        .select(col("doc_id"), col("lang_true"), col("lang_trained"),
          graft.text.TextAnalysis.langId(col("text")).as("lang_regex"))
      res.groupBy((col("doc_id") % 20).as("dom"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("lang_true") === col("lang_trained"), 1)
            .otherwise(0)).cast("long").as("n_trained_ok"),
          sum(when(col("lang_true") === col("lang_regex"), 1)
            .otherwise(0)).cast("long").as("n_regex_ok"),
          sum(when(col("lang_true") === "xx" &&
            col("lang_regex") === "en", 1).otherwise(0)).cast("long")
            .as("n_regex_false_en"))
        .orderBy(col("dom"))
    }),
  )

  val oracleSql: Map[String, String] = Map(

    // q275's scheduler chain replays verbatim; the conditional tail is
    // id arithmetic — every scheduled stored URL is lastmod-bumped, so
    // the 304 count is exactly the spurious-lastmod class the ETag
    // saves; validators are md5s both engines compute
    "q279_etag_fetch" -> {
      import graft.graph.WebGraph
      s"""WITH efe AS (SELECT
         |    'd' || CAST(doc_id % 20 AS VARCHAR) || '.example.com' AS host,
         |    '<url><loc>' || ${urlSqlOf("doc_id")} || '</loc><lastmod>' ||
         |    '2025-01-' || lpad(CAST((doc_id * 7) % 28 + 1 +
         |      (CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) AS VARCHAR),
         |      2, '0') ||
         |    '</lastmod></url>' AS e
         |  FROM documents WHERE (doc_id // 20) % 6 <> 5),
         |efm AS (SELECT host, string_agg(e, '') AS xml
         |  FROM efe GROUP BY host),
         |${WebGraph.parseSitemapsCtes("efm", "host", "xml", "ef2")},
         |efstate AS (SELECT ${urlSqlOf("doc_id")} AS url,
         |    '2025-01-' || lpad(CAST((doc_id * 7) % 28 + 1 AS VARCHAR),
         |      2, '0') AS stored_lastmod
         |  FROM documents WHERE (doc_id // 20) % 5 <> 4),
         |efcand AS (SELECT i.url, i.lastmod,
         |    CAST(regexp_extract(i.url, '/p/([0-9]+)$$', 1) AS BIGINT) % 20 AS dom
         |  FROM ef2maps i LEFT JOIN efstate s ON s.url = i.url
         |  WHERE s.stored_lastmod IS NULL OR i.lastmod > s.stored_lastmod),
         |efrob AS (SELECT
         |    'd' || CAST(k AS VARCHAR) || '.example.com' AS host,
         |    'User-agent: *' || chr(10) || 'Disallow: /*9$$' || chr(10) ||
         |    'Disallow: /p/2' || chr(10) ||
         |    'Crawl-delay: ' || CAST((k % 4) * 5 + 5 AS VARCHAR) AS txt
         |  FROM (SELECT unnest(generate_series(0, 19)) AS k)),
         |${WebGraph.parseRobotsForCtes("efrob", "host", "txt",
             "graftbot", "ep")},
         |efdist AS (SELECT DISTINCT url FROM efcand),
         |${WebGraph.urlDecisionsCtes("efdist", "eprules", "eq")},
         |efallow AS (SELECT c.url, c.lastmod, c.dom,
         |    'd' || CAST(c.dom AS VARCHAR) || '.example.com' AS host
         |  FROM efcand c JOIN eqdec d ON d.url = c.url
         |  WHERE d.action = 'allow'),
         |efslot AS (SELECT a.url, a.lastmod, a.dom, a.host,
         |    GREATEST(1, 60 // coalesce(dl.delay, 60)) AS slots
         |  FROM efallow a LEFT JOIN epdelay dl ON dl.host = a.host),
         |efrk AS (SELECT url, dom, slots,
         |    row_number() OVER (PARTITION BY host
         |      ORDER BY lastmod DESC, url) AS rk
         |  FROM efslot),
         |efsched AS (SELECT url, dom FROM efrk WHERE rk <= slots),
         |efx AS (SELECT f.dom, d.text,
         |    (d.doc_id % 3 = 0 AND d.doc_id % 7 <> 2) AS chg,
         |    ((d.doc_id // 20) % 5 <> 4) AS instate
         |  FROM (SELECT dom,
         |      CAST(regexp_extract(url, '/p/([0-9]+)$$', 1) AS BIGINT) AS doc_id
         |    FROM efsched) f
         |  JOIN documents d ON d.doc_id = f.doc_id)
         |SELECT dom,
         |  CAST(count(*) AS BIGINT) AS n_scheduled,
         |  CAST(SUM(CASE WHEN NOT instate OR chg THEN 1 ELSE 0 END) AS BIGINT) AS n_200,
         |  CAST(SUM(CASE WHEN instate AND NOT chg THEN 1 ELSE 0 END) AS BIGINT) AS n_304_etag,
         |  CAST(SUM(CASE WHEN NOT instate OR chg THEN length(text) + (CASE WHEN chg THEN 3 ELSE 0 END) ELSE 0 END) AS BIGINT) AS bytes_fetched,
         |  CAST(SUM(CASE WHEN instate AND NOT chg THEN length(text) ELSE 0 END) AS BIGINT) AS bytes_saved,
         |  CAST(count(*) AS BIGINT) AS n_clean,
         |  CAST(count(*) AS BIGINT) AS n_etag_clean
         |FROM efx GROUP BY dom ORDER BY dom""".stripMargin
    },

    // inflate ∘ deflate is the identity under BOTH framings of the
    // 'deflate' label; the oracle predicts a clean sweep and the
    // class counts from id arithmetic alone (the q261 posture)
    "q280_deflate_bodies" ->
      s"""SELECT doc_id % 20 AS dom,
         |  CAST(count(*) AS BIGINT) AS n_records,
         |  CAST(SUM(CASE WHEN doc_id % 4 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_gzip,
         |  CAST(SUM(CASE WHEN doc_id % 4 IN (2, 3) THEN 1 ELSE 0 END) AS BIGINT) AS n_deflate,
         |  CAST(count(*) AS BIGINT) AS n_clean,
         |  CAST(SUM(length(text)) AS BIGINT) AS sum_chars
         |FROM documents GROUP BY 1 ORDER BY dom""".stripMargin,

    // the version chain is deterministic: DEFAULT 7 fills every row,
    // the UPDATE overwrites the odd half under the POST-rename name,
    // and the pre-alter snapshot still serves text_len/tag
    "q282_alter_columns" ->
      s"""SELECT doc_id,
         |  CAST(length(text) AS BIGINT) AS len_chars,
         |  CASE WHEN doc_id % 2 = 1 THEN CAST(length(text) * 3 AS BIGINT)
         |       ELSE CAST(7 AS BIGINT) END AS score,
         |  CAST(length(text) AS BIGINT) AS old_len,
         |  't' || CAST(doc_id % 3 AS VARCHAR) AS old_tag
         |FROM documents ORDER BY doc_id""".stripMargin,

    // fit + apply replay bit-exactly (integer costs), the regex argmax
    // replays from the marker-hit columns — both sides are exact
    "q284_trained_langid" -> {
      import PipelineQueries.{langCaseSql, langHitColsSql}
      s"""WITH lgfx AS (SELECT doc_id,
         |    CASE WHEN doc_id % 2 = 0 THEN text ELSE $CipherSql END AS text,
         |    CASE WHEN doc_id % 2 = 0 THEN 'en' ELSE 'xx' END AS lang_true
         |  FROM documents),
         |lgseeds AS (SELECT doc_id AS id, lang_true AS label, text
         |  FROM lgfx WHERE doc_id % 10 IN (0, 5)),
         |lgdocs AS (SELECT doc_id AS id, text FROM lgfx),
         |${graft.text.LangClassifier.classifyCtes("lgseeds", "lgdocs",
             "lc")},
         |lgrx AS (SELECT doc_id, lang_true,
         |$langHitColsSql
         |  FROM lgfx),
         |lgr2 AS (SELECT doc_id, lang_true,
         |  $langCaseSql AS lang_regex
         |  FROM lgrx)
         |SELECT r.doc_id % 20 AS dom,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN r.lang_true = p.lang_trained THEN 1 ELSE 0 END) AS BIGINT) AS n_trained_ok,
         |  CAST(SUM(CASE WHEN r.lang_true = r.lang_regex THEN 1 ELSE 0 END) AS BIGINT) AS n_regex_ok,
         |  CAST(SUM(CASE WHEN r.lang_true = 'xx' AND r.lang_regex = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_regex_false_en
         |FROM lgr2 r JOIN lcpred p ON p.id = r.doc_id
         |GROUP BY 1 ORDER BY dom""".stripMargin
    },
  )
}
