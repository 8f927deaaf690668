package graft.queries

import graft.sources.Tables
import graft.text.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 generality queries: the forward-looking gaps the round-6
  * verdict ranked — Unicode-normalizing text canonicalization (NFC/NFD
  * variant spellings of the same text must dedup together; non-Latin
  * corpora must survive normalization). Every query replays
  * bit-identically in the DuckDB oracle.
  */
object Round7Queries {

  // Composed vs decomposed spellings of one prefix, planted onto every
  // document: "Café δοκιμή: " with é=U+00E9, ή=U+03AE (NFC), and
  // e+U+0301, η+U+0301 (NFD). Raw bytes differ; NFC folds them
  // together. Identical \u escapes in the Spark literals and the
  // oracle SQL text compile to identical UTF-8 on both engines.
  private[queries] val PrefixNfc = "Caf\u00e9 \u03b4\u03bf\u03ba\u03b9\u03bc\u03ae: "
  private[queries] val PrefixNfd = "Cafe\u0301 \u03b4\u03bf\u03ba\u03b9\u03bc\u03b7\u0301: "

  /** The DuckDB replay of [[TextAnalysis.normalizedUnicode]]. */
  private[queries] def normalizedUnicodeSql(c: String): String =
    "trim(regexp_replace(regexp_replace(" +
      s"lower(nfc_normalize($c)), '[^\\p{L}\\p{N}\\s]', '', 'g'), " +
      "'\\s+', ' ', 'g'))"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Unicode-canonical exact dedup: the corpus carries each document
    // twice — once under an NFC spelling of a (partly non-Latin)
    // prefix, once under its NFD decomposition. Byte-level
    // fingerprints would see 2N distinct documents; the NFC canonical
    // form folds each pair onto one fingerprint (n = 2 per group),
    // and the Greek text survives normalization instead of degrading
    // to whitespace. Same shuffle shape as q18: 16-byte fingerprints
    // move, never bodies.
    "q109_unicode_dedup" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      val composed = docs.select((col("doc_id") * 2).as("rid"),
        concat(lit(PrefixNfc), col("text")).as("t"))
      val decomposed = docs.select((col("doc_id") * 2 + 1).as("rid"),
        concat(lit(PrefixNfd), col("text")).as("t"))
      composed.unionByName(decomposed)
        .withColumn("fp", TextAnalysis.fingerprintUnicode(col("t")))
        .groupBy(col("fp"))
        .agg(count(lit(1)).as("n"), min(col("rid")).as("first_rid"))
        .select(col("first_rid"), col("n"), col("fp"))
        .orderBy(col("first_rid"))
    })
  )

  val oracleSql: Map[String, String] = Map(

    "q109_unicode_dedup" ->
      s"""WITH corpus AS (
         |  SELECT doc_id * 2 AS rid, '$PrefixNfc' || text AS t
         |  FROM documents
         |  UNION ALL
         |  SELECT doc_id * 2 + 1, '$PrefixNfd' || text FROM documents),
         |fps AS (SELECT rid, md5(${normalizedUnicodeSql("t")}) AS fp
         |  FROM corpus)
         |SELECT min(rid) AS first_rid, CAST(count(*) AS BIGINT) AS n, fp
         |FROM fps GROUP BY fp ORDER BY first_rid""".stripMargin
  )
}
