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
    }
  )
}
