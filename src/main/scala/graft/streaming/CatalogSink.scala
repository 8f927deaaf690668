package graft.streaming

import graft.catalog.ParquetCatalog
import org.apache.spark.sql.DataFrame

/** Exactly-once `foreachBatch` sink into a [[ParquetCatalog]] table.
  *
  * Structured Streaming's foreachBatch contract is at-least-once: after
  * a crash between the user action and the checkpoint commit, the SAME
  * batch id is replayed — a plain `catalog.append` would double-write
  * it. This sink commits the batch id as version METADATA, which rides
  * the version directory's atomic rename: data and batch id become
  * visible together or not at all, so a replayed id is detected from the
  * current version and skipped. The same (appId, batchId)-in-commit-log
  * recipe table formats like Delta use for idempotent foreachBatch.
  *
  * Optional maintenance: `compactEvery = n` compacts the table after
  * every n-th committed batch, countering streaming small-file
  * accretion inside the pipeline that causes it.
  */
final class CatalogSink(cat: ParquetCatalog, table: String,
    compactEvery: Int = 0) extends ((DataFrame, Long) => Unit)
    with Serializable {

  private[streaming] def lastCommitted(): Long =
    cat.currentMeta(table).get(CatalogSink.BatchKey).map(_.toLong)
      .getOrElse(-1L)

  override def apply(batch: DataFrame, batchId: Long): Unit = {
    if (batchId <= lastCommitted()) return // crash replay: already committed
    cat.append(table, batch,
      meta = Map(CatalogSink.BatchKey -> batchId.toString))
    if (compactEvery > 0 && batchId % compactEvery == compactEvery - 1)
      cat.compact(table)
  }
}

object CatalogSink {
  val BatchKey = "stream.lastBatchId"
}
