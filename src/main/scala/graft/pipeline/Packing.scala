package graft.pipeline

import graft.text.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: lay documents head-to-tail and cut every `seqLen`
  * tokens — the concat-then-chunk packing an LLM pretraining loader
  * runs to turn a ragged corpus into fixed-length training sequences
  * with no padding waste.
  *
  * Documents are routed to `numGroups` independent streams
  * (deterministically, by id) and packed within each stream. The
  * prefix sum over a stream's token tape is computed in TWO PHASES so
  * no task ever holds more than one range-slice of one stream:
  *
  *   1. range-partition on `(grp, id)` — partition ids are then
  *      monotone in stream order — and prefix-sum WITHIN each
  *      `(grp, cell)` slice (a window whose partitions are
  *      shuffle-partition-sized, not stream-sized);
  *   2. aggregate one subtotal row per `(grp, cell)` (a relation the
  *      size of the shuffle partition count), turn it into per-cell
  *      base offsets with a tiny window, and broadcast-join it back.
  *
  * `start_tok = base_off + cell_cum - n_tok` is then exact global
  * placement. Parallelism is bounded by the shuffle partition count,
  * not `numGroups`: a 100 TB stream is processed as thousands of
  * bounded slices instead of funnelling through one task. The layout
  * itself (all integer arithmetic) is unchanged from the single-window
  * formulation and replays bit-identically in the DuckDB oracle (q91).
  */
object Packing {

  /** Per-document placement in the packed layout:
    *
    *   - `grp`: the document's stream (id mod `numGroups`);
    *   - `n_tok`: its token count (docs with zero tokens are dropped —
    *     they occupy no space in the packed output);
    *   - `start_tok`: its first token's offset in the stream's infinite
    *     token tape;
    *   - `seq_first`: the training sequence its first token lands in;
    *   - `seq_off`: offset within that sequence;
    *   - `n_seqs`: how many sequences the document straddles.
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
      seqLen: Int = 2048, numGroups: Int = 8): DataFrame = {
    val id = col(idCol)
    val L = lit(seqLen.toLong)
    // Phase 1: monotone slices. Range partitioning guarantees that for
    // two docs of the same stream, id order implies cell order, so
    // per-cell sums compose into the stream's global prefix sum. The
    // cell id is deterministic given the input (seeded range sampler),
    // and the final offsets are independent of the slicing entirely.
    val sliced = docs
      .select(id, (id % numGroups).as("grp"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tok"))
      .filter(col("n_tok") > 0)
      .repartitionByRange(col("grp"), id)
      .withColumn("cell", spark_partition_id())
    val wCell = Window.partitionBy(col("grp"), col("cell")).orderBy(id)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withinCell = sliced
      .withColumn("cell_cum", sum(col("n_tok")).over(wCell))
    // Phase 2: one row per (grp, cell) — shuffle-partition-count-sized,
    // so the exclusive-prefix window over it is a driver-trivial plan —
    // then broadcast the base offsets back onto the slices.
    val wOff = Window.partitionBy(col("grp")).orderBy(col("cell"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val baseOff = withinCell
      .groupBy(col("grp"), col("cell"))
      .agg(sum(col("n_tok")).as("cell_tot"))
      .select(col("grp"), col("cell"),
        coalesce(sum(col("cell_tot")).over(wOff), lit(0L)).as("base_off"))
    withinCell
      .join(broadcast(baseOff), Seq("grp", "cell"))
      .withColumn("cum", col("base_off") + col("cell_cum"))
      .withColumn("start_tok", col("cum") - col("n_tok"))
      .select(id, col("grp"), col("n_tok"),
        col("start_tok"),
        expr(s"start_tok div ${seqLen}L").as("seq_first"),
        (col("start_tok") % L).as("seq_off"),
        (expr(s"(cum - 1) div ${seqLen}L") -
          expr(s"start_tok div ${seqLen}L") + 1L).as("n_seqs"))
  }
}
