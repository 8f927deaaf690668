package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-7 continuation: the streaming ingest front door for the
  * near-dup index (q118). Every query replays bit-identically in the
  * DuckDB oracle.
  */
object Round7bQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Streaming near-dup ingestion, run FOR REAL: the planted corpus
    // is staged as a multi-file landing directory, a file-source
    // stream drains it one file per micro-batch (AvailableNow), and
    // foreachBatch folds each batch into the incremental LSH index.
    // Per-batch pair outputs are exactly-once across batches, so the
    // accumulated set must equal the one-shot run — the oracle is the
    // SAME whole-corpus SQL replay as q20/q97, making "streamed ==
    // batch" a hash-checked contract, not just a spec assertion.
    "q118_stream_lsh_ingest" -> ((s, dir) => {
      val stage = Files.createTempDirectory("graft-q118-landing").toString
      val cp = Files.createTempDirectory("graft-q118-cp").toString
      // Distributed staging write (no driver collect): 3 hash-split
      // files so the drain runs several real micro-batches. The pair
      // SET is batching-independent either way.
      PipelineQueries.corpus(s, dir)
        .repartition(3, col("doc_id"))
        .write.mode("overwrite").parquet(stage)
      val schema = s.read.parquet(stage).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(stage)
      val (_, pairs) = graft.streaming.StreamingLsh.ingest(
        stream, "doc_id", "text", cp)
      pairs.orderBy(col("a"), col("b"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    // identical to q20/q97's replay: streaming must not change the answer
    "q118_stream_lsh_ingest" -> {
      import PipelineQueries.{corpusSql, shinglesSql, minhashCtesSql,
        jaccardTailSql}
      s"""WITH $corpusSql,
         |${shinglesSql("corpus")},
         |$minhashCtesSql,
         |${jaccardTailSql("0.5")}""".stripMargin
    }
  )
}
