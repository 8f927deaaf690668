package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16: transport realism, continued — WHATWG windows-1252
  * decode + charset-alias normalization (q270), `Transfer-Encoding:
  * chunked` bodies (q271).
  *
  * Reference scope: nothing here maps to
  * /root/reference/SCD_script.txt — these extend the crawl-ingest
  * family the north star adds on top.
  */
object Round16Queries {

  private def urlOf(t: Column): Column =
    concat(lit("http://d"), (t % 20).cast("string"),
      lit(".example.com/p/"), t.cast("string"))

  /** Curly-quote/em-dash plant: every 'a' becomes U+2019 (cp1252
    * 0x92) and every 'e' U+2014 (0x97) — both codepoints live in the
    * 0x80–0x9F hole where windows-1252 and ISO-8859-1 DISAGREE, so a
    * C1-identity decode of latin-1-labeled bytes corrupts every one
    * of them (the WHATWG rationale made measurable).
    */
  private def styled(t: Column): Column =
    translate(t, "ae", "’—")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // WINDOWS-1252 transport: odd ids land as cp1252 BYTES labeled
    // with a rotating WHATWG alias (latin1 / iso-8859-1 / cp1252 /
    // windows-1252 / l1 — every label must normalize or its docs'
    // curly quotes decode as C1 controls and the clean match dies);
    // even ids land as UTF-8 under its aliases. The control column
    // n_c1_clean replays the OLD latin-1-identity decode: it only
    // matches docs whose text had no 'a'/'e' at all (pure-ASCII after
    // the plant) — the oracle predicts exactly that count.
    "q270_cp1252_ingest" -> ((s, dir) => {
      import java.nio.file.Files
      import graft.sources.Warc
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"))
      val tr = styled(col("text"))
      val odd = col("doc_id") % 2 === 1
      val w1252Labels = array(lit("latin1"), lit("iso-8859-1"),
        lit("cp1252"), lit("windows-1252"), lit("l1"))
      val utf8Labels = array(lit("utf-8"), lit("utf8"))
      val cs = when(odd, element_at(w1252Labels,
          (expr("doc_id div 2") % 5).cast("int") + 1))
        .otherwise(element_at(utf8Labels,
          (expr("doc_id div 2") % 2).cast("int") + 1))
      val body = when(odd, Warc.encodeCp1252(tr))
        .otherwise(encode(tr, "UTF-8"))
      val pages = docs.select(col("doc_id"),
        urlOf(col("doc_id")).as("uri"),
        Warc.httpResponseBytes(lit(200), lit("text/html"), cs,
          lit(""), body).as("payload"))
      val land = Files.createTempDirectory("graft-q270-warc").toString
      Warc.writeSegmentsBinary(pages.repartition(4, col("doc_id")),
        "uri", "payload", land, gzip = true)
      val back = Warc.readRecordsBinary(s, land)
        .select(regexp_extract(col("uri"), "/p/([0-9]+)$", 1)
          .cast("long").as("doc_id"),
          Warc.payloadText(col("body")).as("pt"),
          Warc.bodyBytes(col("body")).as("bb"))
      val hdr = Warc.httpCharset(col("pt"))
      val parsed = back.select(col("doc_id"),
        Warc.normalizeCharset(hdr).as("ncs"),
        Warc.decodeBody(col("bb"), hdr).as("decoded"),
        // the pre-WHATWG C1-identity decode, kept as the CONTROL
        decode(col("bb"), "ISO-8859-1").as("c1"))
      val res = parsed.join(docs, Seq("doc_id"))
        .select(col("doc_id"), col("ncs"),
          (col("decoded") === styled(col("text"))).as("cm"),
          (col("c1") === styled(col("text"))).as("c1m"),
          (length(col("decoded")) -
            length(regexp_replace(regexp_replace(col("decoded"),
              "’", ""), "—", ""))).cast("long").as("hi"),
          length(col("decoded")).cast("long").as("nch"))
        .groupBy((col("doc_id") % 20).as("dom"))
        .agg(count(lit(1)).as("n_records"),
          sum(when(col("ncs") === "windows-1252", 1).otherwise(0))
            .cast("long").as("n_cp1252"),
          sum(when(col("cm"), 1).otherwise(0)).cast("long")
            .as("n_clean"),
          sum(when(col("c1m"), 1).otherwise(0)).cast("long")
            .as("n_c1_clean"),
          sum(col("hi")).as("sum_hi"),
          sum(col("nch")).as("sum_chars"))
        .orderBy(col("dom"))
        .localCheckpoint()
      Round7bQueries.rmTree(land)
      res
    }),

    // CHUNKED transfer coding: even ids land chunk-framed (per-row
    // chunk size 7..19 so every body spans multiple chunks), a third
    // gzip-coded INSIDE the chunks, a fifth latin-1-labeled — all
    // eight combinations appear, and chunked ∧ id%4==2 records carry
    // a planted TRAILER field the dechunker must skip. The reader
    // peels the real HTTP onion in order: dechunk → inflate → charset
    // decode; clean match proves byte-exactness through all three
    // layers and real storage.
    "q271_chunked_transport" -> ((s, dir) => {
      import java.nio.file.Files
      import graft.sources.Warc
      import graft.functions.{Chunked, Gzip}
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"))
      val t = col("doc_id")
      val tr = translate(col("text"), "ae", "éä")
      val chunked = t % 2 === 0
      val gz = t % 3 === 1
      val latin = t % 5 === 2
      val cs = when(latin, lit("iso-8859-1")).otherwise(lit("utf-8"))
      val raw = when(latin, encode(tr, "ISO-8859-1"))
        .otherwise(encode(tr, "UTF-8"))
      val enc = when(gz, lit("gzip")).otherwise(lit(""))
      val b1 = when(gz, Gzip.deflateCol(raw)).otherwise(raw)
      val payload0 = when(chunked,
        Warc.httpResponseChunked(lit(200), lit("text/html"), cs, enc,
          b1, lit(7) + (t % 13)))
        .otherwise(Warc.httpResponseBytes(lit(200), lit("text/html"),
          cs, enc, b1))
      // trailer plant: swap the terminal CRLF for a trailer field +
      // CRLF (the dechunker must skip trailer lines, not emit them)
      val payload = when(chunked && t % 4 === 2,
        concat(payload0.substr(lit(1), length(payload0) - 2),
          encode(lit("X-Graft-Trailer: 1\r\n\r\n"), "ISO-8859-1")))
        .otherwise(payload0)
      val pages = docs.select(col("doc_id"),
        urlOf(t).as("uri"), payload.as("payload"))
      val land = Files.createTempDirectory("graft-q271-warc").toString
      Warc.writeSegmentsBinary(pages.repartition(4, col("doc_id")),
        "uri", "payload", land, gzip = true)
      val back = Warc.readRecordsBinary(s, land)
        .select(regexp_extract(col("uri"), "/p/([0-9]+)$", 1)
          .cast("long").as("doc_id"),
          Warc.payloadText(col("body")).as("pt"),
          Warc.bodyBytes(col("body")).as("bb"))
      val te = Warc.httpTransferEncoding(col("pt"))
      val ce = Warc.httpContentEncoding(col("pt"))
      val deframed = when(te === "chunked",
        Chunked.dechunkCol(col("bb"))).otherwise(col("bb"))
      val inflated = when(ce === "gzip", Gzip.inflateCol(deframed))
        .otherwise(deframed)
      val parsed = back.select(col("doc_id"), te.as("te"), ce.as("ce"),
        Warc.httpCharset(col("pt")).as("cs"),
        Warc.decodeBody(inflated, Warc.httpCharset(col("pt")))
          .as("decoded"))
      val res = parsed.join(docs, Seq("doc_id"))
        .select(col("doc_id"), col("te"), col("ce"), col("cs"),
          (col("decoded") === translate(col("text"), "ae", "éä"))
            .as("cm"),
          length(col("decoded")).cast("long").as("nch"))
        .groupBy((col("doc_id") % 20).as("dom"))
        .agg(count(lit(1)).as("n_records"),
          sum(when(col("te") === "chunked", 1).otherwise(0))
            .cast("long").as("n_chunked"),
          sum(when(col("ce") === "gzip", 1).otherwise(0))
            .cast("long").as("n_gzip"),
          sum(when(col("cs") === "iso-8859-1", 1).otherwise(0))
            .cast("long").as("n_latin1"),
          sum(when(col("cm"), 1).otherwise(0)).cast("long")
            .as("n_clean"),
          sum(col("nch")).as("sum_chars"))
        .orderBy(col("dom"))
        .localCheckpoint()
      Round7bQueries.rmTree(land)
      res
    }),
  )

  val oracleSql: Map[String, String] = Map(

    // decode∘encode is the identity per charset ONLY when every alias
    // normalizes to windows-1252: the oracle predicts a clean sweep,
    // the exact plant counts, and the C1-identity control = docs with
    // no 'a'/'e' at all (the only ones a latin-1-identity decode
    // still matches)
    "q270_cp1252_ingest" ->
      s"""SELECT doc_id % 20 AS dom,
         |  CAST(count(*) AS BIGINT) AS n_records,
         |  CAST(SUM(doc_id % 2) AS BIGINT) AS n_cp1252,
         |  CAST(count(*) AS BIGINT) AS n_clean,
         |  CAST(SUM(CASE WHEN length(replace(replace(text, 'a', ''), 'e', '')) = length(text) THEN 1 ELSE 0 END) AS BIGINT) AS n_c1_clean,
         |  CAST(SUM(length(text) - length(replace(replace(text, 'a', ''), 'e', ''))) AS BIGINT) AS sum_hi,
         |  CAST(SUM(length(text)) AS BIGINT) AS sum_chars
         |FROM documents GROUP BY 1 ORDER BY dom""".stripMargin,

    // dechunk ∘ chunk, inflate ∘ deflate, decode ∘ encode — each
    // layer is the identity, so the oracle predicts a clean sweep
    // and the coin counts from id arithmetic alone
    "q271_chunked_transport" ->
      s"""SELECT doc_id % 20 AS dom,
         |  CAST(count(*) AS BIGINT) AS n_records,
         |  CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_chunked,
         |  CAST(SUM(CASE WHEN doc_id % 3 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_gzip,
         |  CAST(SUM(CASE WHEN doc_id % 5 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_latin1,
         |  CAST(count(*) AS BIGINT) AS n_clean,
         |  CAST(SUM(length(text)) AS BIGINT) AS sum_chars
         |FROM documents GROUP BY 1 ORDER BY dom""".stripMargin,
  )
}
