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
  * A single global concatenation order would funnel the cumulative sum
  * through one partition, so documents are first routed to `numGroups`
  * independent streams (deterministically, by id) and packed within
  * each stream: the window is PARTITIONED by stream — numGroups
  * parallel prefix sums, each bounded by its stream's documents. At
  * cluster scale, numGroups ≈ the write parallelism you want for the
  * packed output (each stream becomes one writer's sequence space).
  *
  * All integer arithmetic (token counts, prefix sums, floor division)
  * — the layout replays bit-identically in the DuckDB oracle (q91).
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
    val w = Window.partitionBy(col("grp")).orderBy(id)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(id, (id % numGroups).as("grp"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tok"))
      .filter(col("n_tok") > 0)
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("start_tok", col("cum") - col("n_tok"))
      .select(id, col("grp"), col("n_tok"),
        col("start_tok"),
        expr(s"start_tok div ${seqLen}L").as("seq_first"),
        (col("start_tok") % L).as("seq_off"),
        (expr(s"(cum - 1) div ${seqLen}L") -
          expr(s"start_tok div ${seqLen}L") + 1L).as("n_seqs"))
  }
}
