package graft.text

import graft.functions.PortableHash
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
  * SIGMOD 2003 — the MOSS algorithm): positional k-gram hashes, then
  * from every window of `w` consecutive gram positions select the
  * MINIMUM hash, rightmost on ties. The selection guarantee: any match
  * of at least w + k - 1 consecutive tokens between two documents
  * shares at least one selected fingerprint, while storage is ~2/(w+1)
  * of the gram count — the standard local, position-aware alternative
  * to MinHash when match LOCATION matters (plagiarism/provenance).
  *
  * Portability: the per-window rightmost-min is ONE integer `min` —
  * the (hash, position) choice is packed into a single BIGINT key
  * `h40 * 2^22 + (2^22 - 1 - pos)` (40-bit hash, position < 2^22), so
  * smaller key = smaller hash, then RIGHTMOST position; both engines
  * take `min` over the same ROWS frame and decode with truncating
  * division on nonnegative terms (Spark `div` == DuckDB `//`).
  *
  * Scale shape: one doc-keyed window pass builds positional grams
  * (q100's lead idiom), one more computes the windowed min — doc-sized
  * partitions, no corpus-wide shuffle beyond the doc keying; the
  * fingerprint relation is the compact artifact downstream joins use.
  */
object Winnow {

  private val PosBits = 22
  private val PosCap = (1L << PosBits) - 1

  /** Cross-document matches from a fingerprint relation: pairs sharing
    * selected fingerprints, with match mass and position extents on
    * both sides — the provenance query winnowing exists to serve
    * ("who copied which span from whom"). The join is keyed on the
    * 40-bit fingerprint value — collision-bucketed, never all-pairs;
    * hot fingerprints (boilerplate) can be capped with `maxDf` exactly
    * like duplicateSpans' hot-gram cap. */
  def matches(fps: DataFrame, idCol: String,
      minShared: Int = 2, maxDf: Long = 0L): DataFrame = {
    val base =
      if (maxDf > 0) {
        val hot = fps.groupBy(col("fp")).agg(count(lit(1)).as("df"))
          .filter(col("df") <= maxDf).select("fp")
        fps.join(hot, "fp")
      } else fps
    val l = base.select(col(idCol).as("a"), col("fp"),
      col("pos").as("pos_a"))
    val r = base.select(col(idCol).as("b"), col("fp"),
      col("pos").as("pos_b"))
    l.join(r, Seq("fp")).filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_shared"),
        min(col("pos_a")).as("a_from"), max(col("pos_a")).as("a_to"),
        min(col("pos_b")).as("b_from"), max(col("pos_b")).as("b_to"))
      .filter(col("n_shared") >= minShared)
  }

  /** CROSS-corpus provenance matches: `fpsA`'s fingerprints joined
    * against `fpsB`'s — one (a, b) row per document pair sharing
    * selected fingerprints ACROSS the corpora, never within either.
    * This is the span-level contamination check ("which eval passage
    * appears inside which train document, and where"):
    * [[graft.dedup.Dedup.crossCorpusMatches]] answers whether two
    * documents are near-dups overall; this localizes shared >=
    * (w+k-1)-token passages via the winnowing guarantee, with position
    * extents on both sides. Id spaces may overlap freely. The hot-
    * fingerprint cap `maxDf` is computed over the COMBINED relation —
    * boilerplate is boilerplate whichever corpus it lives in.
    */
  def crossMatches(fpsA: DataFrame, fpsB: DataFrame, idCol: String,
      minShared: Int = 2, maxDf: Long = 0L): DataFrame = {
    val (fa, fb) =
      if (maxDf > 0) {
        val keep = fpsA.select(col("fp"))
          .unionAll(fpsB.select(col("fp")))
          .groupBy(col("fp")).agg(count(lit(1)).as("df"))
          .filter(col("df") <= maxDf).select("fp")
        (fpsA.join(keep, "fp"), fpsB.join(keep, "fp"))
      } else (fpsA, fpsB)
    fa.select(col(idCol).as("a"), col("fp"), col("pos").as("pos_a"))
      .join(fb.select(col(idCol).as("b"), col("fp"),
        col("pos").as("pos_b")), Seq("fp"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_shared"),
        min(col("pos_a")).as("a_from"), max(col("pos_a")).as("a_to"),
        min(col("pos_b")).as("b_from"), max(col("pos_b")).as("b_to"))
      .filter(col("n_shared") >= minShared)
  }

  /** One row per selected fingerprint: (idCol, pos, fp) — the k-gram
    * starting at token `pos` (0-based) whose 40-bit hash `fp` was the
    * rightmost window minimum. Documents with fewer than `w` grams
    * (but at least one) contribute their single partial-window
    * rightmost-min, so every non-empty document has >= 1 fingerprint.
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, s"bad winnowing parameters: k=$k w=$w")
    val win = Window.partitionBy(col("doc")).orderBy(col("pos"))
    val toks = docs.select(col(idCol).as("doc"),
      posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos", "tok")))
    val parts = col("tok") +: (1 until k).map(i => lead(col("tok"), i).over(win))
    val grams = toks
      .withColumn("lastTok", lead(col("tok"), k - 1).over(win))
      .withColumn("gh",
        PortableHash.hash60Base(concat_ws(" ", parts: _*)) % (1L << 40))
      .filter(col("lastTok").isNotNull)
    val frame = win.rowsBetween(0, w - 1)
    grams
      .withColumn("key",
        col("gh") * (PosCap + 1) + (lit(PosCap) - col("pos")))
      .withColumn("m", count(lit(1)).over(Window.partitionBy(col("doc"))))
      .withColumn("wmin", min(col("key")).over(frame))
      .withColumn("nf", count(lit(1)).over(frame))
      .filter(col("nf") === w || (col("m") < w && col("pos") === 0))
      .select(col("doc"), col("wmin")).distinct()
      .select(col("doc").as(idCol),
        (lit(PosCap) - expr(s"wmin % ${PosCap + 1}L")).as("pos"),
        expr(s"wmin div ${PosCap + 1}L").as("fp"))
  }
}
