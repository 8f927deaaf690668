package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 queries: the CONSUMABILITY layer — the binary loader
  * artifact (export/read-back of packed token streams, q170/q171) and
  * release-over-release operations. Every query replays bit-identically
  * in the DuckDB oracle.
  */
object Round10Queries {

  private val toksExpr =
    """list_filter(string_split_regex(text, '\s+'), x -> x <> '')"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // BINARY LOADER EXPORT, index side: export the packed corpus
    // through the catalog's atomic publish (bin + idx tables), then
    // read the published .idx back and emit it — the round trip
    // through REAL STORAGE must reproduce q106's manifest VERBATIM
    // (same oracle SQL), proving the artifact a loader maps carries
    // exactly the placement the manifest promised.
    "q170_export_idx" -> ((s, dir) => {
      import java.nio.file.Files
      val root = Files.createTempDirectory("graft-q170").toString
      val cat = new graft.catalog.ParquetCatalog(s, root)
      graft.pipeline.Packing.exportShards(
        Tables(s, dir, "documents"), "doc_id", "text", cat, "shards",
        seqLen = 2048, numGroups = 8)
      val (_, idx) = graft.pipeline.Packing.readShards(cat, "shards")
      val out = idx
        .orderBy(col("grp"), col("seq"), col("seq_from"), col("doc_id"))
        .localCheckpoint()
      Round7bQueries.rmTree(root)
      out
    }),

    // BINARY LOADER EXPORT, token side: read the published .bin back
    // and checksum every sequence buffer with the order-pinning
    // positional weighted sum Σ (i+1)·id_i — computed FROM THE BYTES
    // by a codegen expression. The oracle never sees a byte of binary:
    // it replays the token tape from raw text (portable md5-derived
    // 31-bit token ids, q91's prefix-sum placement) and computes
    // SUM((off+1)*tid) per sequence. Equality proves the binary
    // encode → parquet publish → decode chain preserves every token
    // id, its order, and the sequence boundaries.
    "q171_export_bin" -> ((s, dir) => {
      import java.nio.file.Files
      val root = Files.createTempDirectory("graft-q171").toString
      val cat = new graft.catalog.ParquetCatalog(s, root)
      graft.pipeline.Packing.exportShards(
        Tables(s, dir, "documents"), "doc_id", "text", cat, "shards",
        seqLen = 2048, numGroups = 8)
      val (bin, _) = graft.pipeline.Packing.readShards(cat, "shards")
      val out = bin
        .select(col("grp"), col("seq"), col("n_tok"),
          graft.functions.TokenBinary.weightedSumCol(col("tokens"))
            .as("tok_wsum"))
        .orderBy(col("grp"), col("seq"))
        .localCheckpoint()
      Round7bQueries.rmTree(root)
      out
    })
  )

  val oracleSql: Map[String, String] = Map(
    // the export/import round trip IS the oracle: q106's manifest SQL
    // verbatim (the artifact's idx must match the manifest it claims
    // to materialize)
    "q170_export_idx" -> Round6Queries.oracleSql("q106_seq_manifest"),

    "q171_export_bin" ->
      s"""WITH t AS (SELECT doc_id, doc_id % 8 AS grp, $toksExpr AS ts
         |  FROM documents),
         |c AS (SELECT doc_id, grp, CAST(len(ts) AS BIGINT) AS n_tok, ts
         |  FROM t WHERE len(ts) > 0),
         |p AS (SELECT doc_id, grp, ts,
         |    CAST(SUM(n_tok) OVER (PARTITION BY grp ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) - n_tok AS start_tok
         |  FROM c),
         |tok AS (SELECT grp, (start_tok + i - 1) // 2048 AS seq,
         |    (start_tok + i - 1) % 2048 AS off,
         |    ${graft.pipeline.Packing.tokenIdSql("ts[i]")} AS tid
         |  FROM p, UNNEST(generate_series(1, len(ts))) AS u(i))
         |SELECT grp, seq, CAST(COUNT(*) AS BIGINT) AS n_tok,
         |  CAST(SUM((off + 1) * tid) AS BIGINT) AS tok_wsum
         |FROM tok GROUP BY grp, seq ORDER BY grp, seq""".stripMargin
  )
}
