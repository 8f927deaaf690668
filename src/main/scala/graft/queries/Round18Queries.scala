package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-18: transport realism, continued — CJK / legacy multibyte
  * charset decode (q289): Shift_JIS, EUC-JP, GBK, Big5, EUC-KR under
  * their WHATWG label sets, the largest transport hole a non-Latin
  * crawl hits.
  *
  * Reference scope: nothing here maps to
  * /root/reference/SCD_script.txt — these extend the crawl-ingest
  * family the north star adds on top.
  */
object Round18Queries {

  private def urlOf(t: Column): Column =
    concat(lit("http://d"), (t % 20).cast("string"),
      lit(".example.com/p/"), t.cast("string"))

  /** The five CJK transport classes: canonical WHATWG name, the JDK
    * superset codec [[graft.sources.Warc.decodeBody]] routes it to,
    * the two-codepoint plant ('a'→first, 'e'→second — both OUTSIDE
    * ASCII, so a decode through the wrong codec corrupts every one),
    * and the rotating label aliases (every alias must normalize or its
    * docs' plants decode as mojibake and the class's clean count
    * dies).
    */
  private[graft] val CjkClasses: Array[(String, String, String, Array[String])] =
    Array(
      ("shift_jis", "windows-31j", "日本", // 日本
        Array("shift_jis", "sjis", "ms_kanji", "windows-31j", "x-sjis")),
      ("euc-jp", "EUC-JP", "仮名", // 仮名
        Array("euc-jp", "x-euc-jp", "cseucpkdfmtjapanese")),
      ("gbk", "GBK", "中文", // 中文
        Array("gbk", "gb2312", "chinese", "csgb2312", "iso-ir-58")),
      ("big5", "Big5", "漢字", // 漢字
        Array("big5", "big5-hkscs", "cn-big5", "csbig5")),
      ("euc-kr", "x-windows-949", "한글", // 한글
        Array("euc-kr", "korean", "ks_c_5601-1987", "windows-949")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // CJK LEGACY MULTIBYTE transport: five charset classes by
    // (doc_id div 20) % 5 — div-20 so every dom sees every class (the
    // q163 lesson: doc_id % 20 IS the dom) — each landing as REAL
    // legacy-codec bytes labeled with a rotating WHATWG alias. The
    // plants ('a'/'e' → two in-repertoire CJK codepoints) are
    // multibyte in every class, so ANY alias that fails to normalize
    // falls to the lenient-UTF-8 default, decodes the plant bytes as
    // U+FFFD mojibake, and kills its class's per-dom clean count. The
    // control column n_utf8_clean replays that default on every
    // record: it matches exactly the docs with no 'a'/'e' at all
    // (pure-ASCII after the plant) — mojibake cannot silently pass.
    "q289_cjk_ingest" -> ((s, dir) => {
      import java.nio.file.Files
      import graft.sources.Warc
      import s.implicits._
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"))
      // fixture bytes through the REAL JDK codecs (Spark's encode()
      // covers only the unicode/latin family) — codec boundary work,
      // the colorJpegMedia posture
      val landed = docs.as[(Long, String)].map { case (id, text) =>
        val cls = ((id / 20) % 5).toInt
        val (_, jdk, plant, aliases) = CjkClasses(cls)
        val alias = aliases(((id / 100) % aliases.length).toInt)
        val planted = text.map(c =>
          if (c == 'a') plant.charAt(0)
          else if (c == 'e') plant.charAt(1) else c)
        val bytes = planted.getBytes(java.nio.charset.Charset.forName(jdk))
        (id, alias, bytes)
      }.toDF("doc_id", "label", "body")
      val pages = landed.select(col("doc_id"),
        urlOf(col("doc_id")).as("uri"),
        Warc.httpResponseBytes(lit(200), lit("text/html"), col("label"),
          lit(""), col("body")).as("payload"))
      val land = Files.createTempDirectory("graft-q289-warc").toString
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
        // the pre-CJK default decode, kept as the CONTROL: what every
        // record would have become had its label not normalized
        graft.functions.Gzip.utf8LenientCol(col("bb")).as("u8"))
      val cls = (expr("doc_id div 20") % 5).cast("int")
      // 5 linear when branches (not an exponential fold): per-class
      // canonical name / expected text / plant-char count
      def perClass(f: (String, String) => Column): Column =
        (1 until CjkClasses.length).foldLeft(
          when(cls === 0, f(CjkClasses(0)._1, CjkClasses(0)._3))) {
            (acc, i) => acc.when(cls === i,
              f(CjkClasses(i)._1, CjkClasses(i)._3))
          }
      val expected = perClass((_, plant) =>
        translate(col("text"), "ae", plant))
      val res = parsed.join(docs, Seq("doc_id"))
        .select(col("doc_id"), cls.as("cls"),
          (col("ncs") === perClass((canon, _) => lit(canon))).as("nm"),
          (col("decoded") === expected).as("cm"),
          (col("u8") === expected).as("u8m"),
          perClass((_, plant) => (length(col("decoded")) -
            length(translate(col("decoded"), plant, "")))
            .cast("long")).as("plantn"),
          length(col("decoded")).cast("long").as("nch"))
        .groupBy((col("doc_id") % 20).as("dom"))
        .agg(count(lit(1)).as("n_records"),
          sum(when(col("nm"), 1).otherwise(0)).cast("long").as("n_norm"),
          sum(when(col("cm"), 1).otherwise(0)).cast("long").as("n_clean"),
          sum(when(col("cm") && col("cls") === 0, 1).otherwise(0))
            .cast("long").as("n_clean_sjis"),
          sum(when(col("cm") && col("cls") === 1, 1).otherwise(0))
            .cast("long").as("n_clean_eucjp"),
          sum(when(col("cm") && col("cls") === 2, 1).otherwise(0))
            .cast("long").as("n_clean_gbk"),
          sum(when(col("cm") && col("cls") === 3, 1).otherwise(0))
            .cast("long").as("n_clean_big5"),
          sum(when(col("cm") && col("cls") === 4, 1).otherwise(0))
            .cast("long").as("n_clean_euckr"),
          sum(when(col("u8m"), 1).otherwise(0)).cast("long")
            .as("n_utf8_clean"),
          sum(col("plantn")).as("sum_plant"),
          sum(col("nch")).as("sum_chars"))
        .orderBy(col("dom"))
        .localCheckpoint()
      Round7bQueries.rmTree(land)
      res
    }))

  val oracleSql: Map[String, String] = Map(

    // decode∘encode is the identity per class ONLY when every alias
    // normalizes to its canonical name AND routes to the right
    // superset codec: the oracle predicts a clean sweep, the per-class
    // split, and the UTF-8-default control = docs with no 'a'/'e' at
    // all (the only bodies with zero multibyte sequences)
    "q289_cjk_ingest" ->
      s"""SELECT doc_id % 20 AS dom,
         |  CAST(count(*) AS BIGINT) AS n_records,
         |  CAST(count(*) AS BIGINT) AS n_norm,
         |  CAST(count(*) AS BIGINT) AS n_clean,
         |  CAST(SUM(CASE WHEN (doc_id // 20) % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_clean_sjis,
         |  CAST(SUM(CASE WHEN (doc_id // 20) % 5 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_clean_eucjp,
         |  CAST(SUM(CASE WHEN (doc_id // 20) % 5 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_clean_gbk,
         |  CAST(SUM(CASE WHEN (doc_id // 20) % 5 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_clean_big5,
         |  CAST(SUM(CASE WHEN (doc_id // 20) % 5 = 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_clean_euckr,
         |  CAST(SUM(CASE WHEN length(replace(replace(text, 'a', ''), 'e', '')) = length(text) THEN 1 ELSE 0 END) AS BIGINT) AS n_utf8_clean,
         |  CAST(SUM(length(text) - length(replace(replace(text, 'a', ''), 'e', ''))) AS BIGINT) AS sum_plant,
         |  CAST(SUM(length(text)) AS BIGINT) AS sum_chars
         |FROM documents GROUP BY 1 ORDER BY dom""".stripMargin)
}
