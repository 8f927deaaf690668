package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.quality.Entropy
import graft.sources.Tables

/** Round-8 queries. Every query replays bit-identically in the DuckDB
  * oracle.
  */
object Round8Queries {

  /** Deterministic high-entropy "spew" text: 16 concatenated md5 blocks
    * (alternating case — a 22-symbol near-uniform alphabet, 512 chars),
    * identical derivation in both engines. Collision index lands in
    * [0.050, 0.056], below every real document (min 0.068 at sf0.01).
    */
  private def spewText(id: Column): Column =
    concat((1 to 16).map { i =>
      val block = md5(concat(id.cast("string"), lit(s":e$i")))
      if (i % 2 == 0) upper(block) else block
    }: _*)

  private def spewTextSql(idExpr: String): String =
    (1 to 16).map { i =>
      val block = s"md5($idExpr::VARCHAR||':e$i')"
      if (i % 2 == 0) s"upper($block)" else block
    }.mkString(" || ")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Order-0 character-entropy gate — the Gopher/RefinedWeb gibberish-
    // and-spam signal via the collision index (Renyi-2 entropy under a
    // monotone transform), all-integer gate arithmetic. Planted: random
    // hex spew (%23, must class 'spew') and repeated boilerplate (%29,
    // must class 'spam'); every real document must class 'ok'.
    "q127_entropy_gate" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      val corpus = docs
        .unionByName(docs.filter(col("doc_id") % 23 === 0)
          .select((col("doc_id") + 3000000L).as("doc_id"),
            spewText(col("doc_id")).as("text")))
        .unionByName(docs.filter(col("doc_id") % 29 === 0)
          .select((col("doc_id") + 4000000L).as("doc_id"),
            lit("spam " * 40).as("text")))
      Entropy.gate(corpus, "doc_id", "text").orderBy(col("doc_id"))
    }),

    // Streaming END-TO-END corpus cleaning, run for real: the planted
    // q46 corpus lands as a 3-file staging directory, a file-source
    // stream drains it one file per micro-batch, and each batch is
    // gated (quality + language) and folded into the incremental LSH
    // index inside one foreachBatch frame — land → gate → fold in one
    // pass. Survivors resolve at end of stream from the accumulated
    // materialized state. The oracle is q46's whole-corpus SQL replay
    // VERBATIM while the stream's file batching differs — "streamed
    // cleaning == one-shot cleaning" is a hash-checked contract.
    "q126_stream_corpus_clean" -> ((s, dir) => {
      import java.nio.file.Files
      val stage = Files.createTempDirectory("graft-q126-landing").toString
      val cp = Files.createTempDirectory("graft-q126-cp").toString
      PipelineQueries.corpus(s, dir)
        .repartition(3, col("doc_id"))
        .write.mode("overwrite").parquet(stage)
      val stream = s.readStream.schema(s.read.parquet(stage).schema)
        .option("maxFilesPerTrigger", 1).parquet(stage)
      val (_, gated, pairs) = graft.streaming.StreamingCorpus.ingest(
        stream, "doc_id", "text", cp)
      // gated/pairs are per-batch localCheckpoint'd — the resolve plan
      // never reads the staging files, so they are deletable now
      Round7bQueries.rmTree(stage); Round7bQueries.rmTree(cp)
      graft.streaming.StreamingCorpus
        .resolveSurvivors(gated, pairs, "doc_id", "text")
        .select(col("doc_id"), col("quality"), col("lang_pred"))
        .orderBy(col("doc_id"))
    }),

    // Full PII compliance pass — q81 (email+IPv4) extended with phone
    // numbers, IBAN-shaped account ids, and credit cards with a LUHN
    // validity check as explicit integer arithmetic: card-SHAPED
    // numbers are counted, but only checksum-valid ones are scrubbed
    // (the %19 plant is shaped-but-invalid and must survive). Counts
    // per category + md5 of the fully scrubbed text hash-check the
    // whole rewrite without shipping it.
    "q128_pii_classes" -> ((s, dir) => {
      import graft.text.Pii
      val planted = concat(col("text"),
        when(col("doc_id") % 5 === 0,
          lit(" reach me at user5@example.com")).otherwise(lit("")),
        when(col("doc_id") % 7 === 0,
          lit(" from 192.168.10.77 today")).otherwise(lit("")),
        when(col("doc_id") % 13 === 0,
          lit(" call +1-555-0147 or +44-207-946-0958")).otherwise(lit("")),
        when(col("doc_id") % 17 === 0,
          lit(" card 4539 1488 0343 6467 or 4111111111111111 on file"))
          .otherwise(lit("")),
        when(col("doc_id") % 19 === 0,
          lit(" card 4539-1488-0343-6468 rejected")).otherwise(lit("")),
        when(col("doc_id") % 23 === 0,
          lit(" pay DE44500105175407324931 ref")).otherwise(lit("")))
      Tables(s, dir, "documents")
        .select(col("doc_id"), planted.as("t"))
        .select(col("doc_id"),
          regexp_count(col("t"), lit(Pii.EmailRe)).as("n_email"),
          regexp_count(col("t"), lit(Pii.Ipv4Re)).as("n_ip"),
          regexp_count(col("t"), lit(Pii.PhoneRe)).as("n_phone"),
          size(Pii.cardMatches(col("t"))).as("n_card_shaped"),
          size(Pii.validCards(col("t"))).as("n_card_valid"),
          regexp_count(col("t"), lit(Pii.IbanRe)).as("n_iban"),
          md5(Pii.scrub(col("t"))).as("scrub_md5"))
        .orderBy(col("doc_id"))
    })
  )

  val oracleSql: Map[String, String] = Map(

    // q46's SQL verbatim: streaming the cleaning must not change the answer
    "q126_stream_corpus_clean" -> PipelineQueries.oracleSql("q46_pipeline"),

    "q127_entropy_gate" -> {
      val n2 = "CAST(n_chars * n_chars AS BIGINT)"
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 3000000, ${spewTextSql("doc_id")}
         |  FROM documents WHERE doc_id % 23 = 0
         |  UNION ALL
         |  SELECT doc_id + 4000000, repeat('spam ', 40)
         |  FROM documents WHERE doc_id % 29 = 0),
         |${Entropy.signalsSql("corpus", "doc_id", "text")}
         |SELECT doc_id, n_chars, distinct_chars,
         |  coll_num::DOUBLE / $n2::DOUBLE AS coll,
         |  CASE WHEN coll_num * ${Entropy.SpamDen} >= ${Entropy.SpamNum} * $n2
         |         THEN 'spam'
         |       WHEN coll_num * ${Entropy.SpewDen} <= ${Entropy.SpewNum} * $n2
         |         THEN 'spew'
         |       ELSE 'ok' END AS cls,
         |  NOT (coll_num * ${Entropy.SpamDen} >= ${Entropy.SpamNum} * $n2
         |    OR coll_num * ${Entropy.SpewDen} <= ${Entropy.SpewNum} * $n2)
         |    AS keep
         |FROM entsig ORDER BY doc_id""".stripMargin
    },

    "q128_pii_classes" -> {
      import graft.text.Pii
      s"""WITH p AS (
         |  SELECT doc_id, text
         |    || CASE WHEN doc_id % 5 = 0
         |         THEN ' reach me at user5@example.com' ELSE '' END
         |    || CASE WHEN doc_id % 7 = 0
         |         THEN ' from 192.168.10.77 today' ELSE '' END
         |    || CASE WHEN doc_id % 13 = 0
         |         THEN ' call +1-555-0147 or +44-207-946-0958' ELSE '' END
         |    || CASE WHEN doc_id % 17 = 0
         |         THEN ' card 4539 1488 0343 6467 or 4111111111111111 on file'
         |         ELSE '' END
         |    || CASE WHEN doc_id % 19 = 0
         |         THEN ' card 4539-1488-0343-6468 rejected' ELSE '' END
         |    || CASE WHEN doc_id % 23 = 0
         |         THEN ' pay DE44500105175407324931 ref' ELSE '' END AS t
         |  FROM documents)
         |SELECT doc_id,
         |  len(regexp_extract_all(t, '${Pii.EmailRe}')) AS n_email,
         |  len(regexp_extract_all(t, '${Pii.Ipv4Re}')) AS n_ip,
         |  len(regexp_extract_all(t, '${Pii.PhoneRe}')) AS n_phone,
         |  len(regexp_extract_all(t, '${Pii.CardRe}')) AS n_card_shaped,
         |  len(list_filter(regexp_extract_all(t, '${Pii.CardRe}'),
         |    c -> ${Pii.luhn16Sql(Pii.cardDigitsSql("c"))})) AS n_card_valid,
         |  len(regexp_extract_all(t, '${Pii.IbanRe}')) AS n_iban,
         |  md5(${Pii.scrubSql("t")}) AS scrub_md5
         |FROM p ORDER BY doc_id""".stripMargin
    }
  )
}
