package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → article-text extraction (jusText-lite): the stage-0 a real
  * crawl corpus needs before any text gate can run — markup arrives,
  * clean text is what the pipeline consumes. Deterministic and
  * DuckDB-replayable by construction:
  *
  *  1. drop `<script>`/`<style>` elements and `<!-- -->` comments
  *     (content-free by definition);
  *  2. split the page into BLOCKS at block-level tag boundaries
  *     (`p`, `div`, `h1`–`h6`, `li`, `table` rows, `nav`, `footer`, …);
  *  3. per block, compute the LINK DENSITY from raw tag-stripped
  *     lengths — `link_len = len(strip(block)) − len(strip(block
  *     minus its <a> elements))` (pure length arithmetic: no
  *     per-anchor array folds, no backreferences — the RE2 common
  *     subset both engines share);
  *  4. keep a block iff its normalized text is long enough AND
  *     `link_len · linkDen ≤ raw_len · linkNum` (integer ratio — the
  *     boilerplate gate: navigation bars, related-links boxes and
  *     footers are mostly anchor text and fail it);
  *  5. the extracted document is the kept blocks' normalized text in
  *     page order.
  *
  * Everything is per-document (one posexplode + one per-doc
  * aggregation), so the stage composes with the streaming front door
  * batch-at-a-time — the q133 per-doc-stage argument — and at 100 TB
  * it is one scan with no shuffle beyond the doc-keyed reassembly.
  */
object Html {

  /** Block-boundary tags. Case-insensitive; attribute tails allowed. */
  private[graft] val blockTagPattern: String =
    "(?i)</?(?:p|div|h[1-6]|li|ul|ol|br|table|thead|tbody|tr|td|th|" +
      "header|footer|nav|section|article|blockquote|pre|" +
      "html|head|body|title|main|aside|form|hr)\\b[^>]*>"

  /** Script/style elements and comments removed (no backreferences —
    * RE2-portable: one pattern per element kind).
    */
  private[graft] def dropInvisible(html: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(html,
      "(?is)<script\\b[^>]*>.*?</script>", " "),
      "(?is)<style\\b[^>]*>.*?</style>", " "),
      "(?s)<!--.*?-->", " ")

  /** All remaining tags stripped (raw: no whitespace normalization —
    * the length arithmetic of the density gate needs exact lengths).
    */
  private def stripTags(c: Column): Column =
    regexp_replace(c, "<[^>]*>", "")

  /** The five standard entities, `&amp;` last (single unescape pass). */
  private def unescapeEntities(c: Column): Column =
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(c) { case (acc, (e, r)) => replace(acc, lit(e), lit(r)) }

  /** Whitespace-normalized human text of a block. */
  private def normText(c: Column): Column =
    trim(regexp_replace(unescapeEntities(stripTags(c)), "\\s+", " "))

  /** Per-block relation `(idCol, pos, block, raw_len, link_len,
    * btext)` — blocks that strip to pure whitespace are dropped on
    * BOTH engines before any counting (split-engine empty-trailing
    * semantics differ; non-empty block positions do not).
    */
  private[graft] def blocks(docs: DataFrame, idCol: String,
      htmlCol: String): DataFrame =
    docs
      .select(col(idCol), posexplode(
        split(dropInvisible(col(htmlCol)), blockTagPattern))
        .as(Seq("pos", "block")))
      .withColumn("__t_all", stripTags(col("block")))
      .withColumn("raw_len", length(col("__t_all")))
      .withColumn("link_len", col("raw_len") - length(stripTags(
        regexp_replace(col("block"), "(?is)<a\\b[^>]*>.*?</a>", ""))))
      .withColumn("btext", normText(col("block")))
      .filter(length(col("btext")) > 0)
      .drop("__t_all")

  /** Extract article text per document. Returns one row per input row:
    * `(idCol, text, n_blocks, n_kept)` — `text` empty (never NULL) for
    * pages with no surviving block, `n_blocks` counting the non-blank
    * blocks of the page.
    *
    * @param minTextLen minimum normalized block length (chars) — short
    *   fragments ("Doc 17", breadcrumbs) are boilerplate
    * @param linkNum/linkDen keep iff link_len/raw_len ≤ linkNum/linkDen
    */
  def extract(docs: DataFrame, idCol: String, htmlCol: String,
      minTextLen: Int = 20, linkNum: Int = 1, linkDen: Int = 3)
      : DataFrame = {
    val id = col(idCol)
    val bs = blocks(docs, idCol, htmlCol)
    val perDoc = bs.groupBy(id).agg(
      count(lit(1)).as("n_blocks"),
      sum(when(length(col("btext")) >= minTextLen &&
          col("link_len") * linkDen <= col("raw_len") * linkNum, 1L)
        .otherwise(0L)).as("n_kept"),
      array_join(transform(sort_array(collect_list(
          when(length(col("btext")) >= minTextLen &&
            col("link_len") * linkDen <= col("raw_len") * linkNum,
            struct(col("pos"), col("btext"))))),
        s => s.getField("btext")), "\n").as("text"))
    docs.select(id).join(perDoc, Seq(idCol), "left")
      .select(id, coalesce(col("text"), lit("")).as("text"),
        coalesce(col("n_blocks"), lit(0L)).as("n_blocks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /** [[extract]] projected to the pipeline's input shape: `textCol`
    * REPLACED by the extracted article text (other columns dropped —
    * the [[graft.pipeline.CorpusPipeline]] stage-0 contract).
    */
  def extractText(docs: DataFrame, idCol: String, htmlCol: String,
      minTextLen: Int = 20, linkNum: Int = 1, linkDen: Int = 3)
      : DataFrame =
    extract(docs, idCol, htmlCol, minTextLen, linkNum, linkDen)
      .select(col(idCol), col("text").as(htmlCol))
}
