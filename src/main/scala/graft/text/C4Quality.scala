package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4 cleaning rules (Raffel et al. 2020, §2.2 — the "Colossal Clean
  * Crawled Corpus" heuristics), the LINE-level complement to
  * [[GopherQuality]]'s document-level gates:
  *
  *   - keep only lines ending in a TERMINAL punctuation mark
  *     (`.` `!` `?` or a closing quote);
  *   - keep only lines with ≥ `minWordsPerLine` words (3 in the
  *     paper);
  *   - drop any line containing the word "javascript" (boilerplate
  *     cookie/JS warnings);
  *   - drop the whole page when it contains a curly bracket (code),
  *     the phrase "lorem ipsum" (template filler), or any word from
  *     the bad-word list (parameterized — like [[GopherQuality]]'s
  *     stop list, the THRESHOLDS are published, the word list is a
  *     corpus property);
  *   - drop pages with fewer than `minSentences` sentences after line
  *     filtering (5 in the paper; sentences counted as terminal
  *     punctuation marks in the retained text).
  *
  * Every gate is exact-integer / exact-string, so keep decisions
  * replay bit-identically in DuckDB. Scale shape: ONE line explode +
  * doc-keyed re-aggregation (the retained-line reassembly is a
  * per-doc bounded `array_sort`+`transform` — the per-doc HOF
  * exemption, never per-pair) and per-doc string predicates — no
  * cross-doc state, so the gate is streaming-door compatible by
  * construction. C4's final step, three-sentence-span dedup, is the
  * already-shipped span family (`Dedup.duplicateSpans`/q100, q107).
  */
object C4Quality {

  /** Terminal-punctuation line test (rtrim'd tail must be `.`, `!`,
    * `?`, `"` or `'` — the paper's "terminal punctuation mark
    * (i.e. a period, exclamation mark, question mark, or end
    * quotation mark)").
    */
  private val TerminalRe = "[.!?\"']$"

  /** Per-LINE keep bit over `(line)`: terminal punctuation AND word
    * floor AND no javascript token. Exact-string, engine-portable.
    */
  def lineKeep(line: Column, minWordsPerLine: Int = 3): Column = {
    val t = trim(line)
    val nWords = when(t === "", lit(0))
      .otherwise(size(split(t, "\\s+")))
    rtrim(line).rlike(TerminalRe) &&
      nWords >= minWordsPerLine &&
      !lower(line).rlike("\\bjavascript\\b")
  }

  /** C4 clean over `(idCol, textCol)` → one row per input doc:
    * `(idCol, clean_text, n_lines, n_lines_kept, n_sent, has_brace,
    * has_lorem, has_bad, c4_keep)`. `clean_text` is the retained
    * lines re-joined in order ('' when none survive); `c4_keep` is
    * the page-level verdict.
    */
  def clean(docs: DataFrame, idCol: String, textCol: String,
      badWords: Seq[String] = Nil, minWordsPerLine: Int = 3,
      minSentences: Long = 5L): DataFrame = {
    val id = col(idCol)
    val badRe =
      if (badWords.isEmpty) null
      else "\\b(" + badWords.map(java.util.regex.Pattern.quote)
        .mkString("|") + ")\\b"
    val lineRows = docs.select(id, col(textCol).as("__t"),
      posexplode(split(col(textCol), "\n")).as(Seq("__idx", "__line")))
    val kept = when(lineKeep(col("__line"), minWordsPerLine),
      struct(col("__idx"), col("__line")))
    val agg = lineRows.groupBy(id).agg(
      count(lit(1)).as("n_lines"),
      sum(when(lineKeep(col("__line"), minWordsPerLine), 1L)
        .otherwise(0L)).as("n_lines_kept"),
      // collect_list drops the non-kept NULLs; array_sort restores
      // document order (idx is the struct's first field) — bounded by
      // the doc's own line count, the per-doc HOF exemption
      concat_ws("\n", transform(array_sort(collect_list(kept)),
        x => x.getField("__line"))).as("clean_text"),
      max(when(col("__t").contains("{") || col("__t").contains("}"),
        1L).otherwise(0L)).as("__brace"),
      max(when(lower(col("__t")).contains("lorem ipsum"), 1L)
        .otherwise(0L)).as("__lorem"),
      max(if (badRe == null) lit(0L)
        else when(lower(col("__t")).rlike(badRe), 1L).otherwise(0L))
        .as("__bad"))
    agg.select(id, col("clean_text"), col("n_lines"),
      col("n_lines_kept"),
      (length(col("clean_text")) -
        length(regexp_replace(col("clean_text"), "[.!?]", "")))
        .cast("long").as("n_sent"),
      (col("__brace") === 1L).as("has_brace"),
      (col("__lorem") === 1L).as("has_lorem"),
      (col("__bad") === 1L).as("has_bad"))
      .withColumn("c4_keep",
        !col("has_brace") && !col("has_lorem") && !col("has_bad") &&
          col("n_sent") >= minSentences)
  }

  /** DuckDB CTE chain for [[clean]] over `rel(idCol, textCol)`,
    * ending in `<pfx>out` with [[clean]]'s exact output columns.
    */
  def cleanCtes(rel: String, idCol: String, textCol: String,
      badWords: Seq[String] = Nil, minWordsPerLine: Int = 3,
      minSentences: Long = 5L, pfx: String = "c4"): String = {
    val badPred =
      if (badWords.isEmpty) "FALSE"
      else {
        val alts = badWords
          .map(w => graft.graph.WebGraph.sqlLit(
            java.util.regex.Pattern.quote(w))).mkString("|")
        s"regexp_matches(lower($textCol), '\\b($alts)\\b')"
      }
    s"""${pfx}ln AS (SELECT id, i AS idx, ls[i] AS line FROM (
       |    SELECT $idCol AS id, string_split($textCol, chr(10)) AS ls
       |    FROM $rel),
       |  UNNEST(generate_series(1, len(ls))) AS u(i)),
       |${pfx}lk AS (SELECT id, idx, line,
       |    (regexp_matches(rtrim(line), '[.!?"'']$$')
       |      AND (CASE WHEN trim(line) = '' THEN 0
       |        ELSE len(string_split_regex(trim(line), '\\s+')) END)
       |        >= $minWordsPerLine
       |      AND NOT regexp_matches(lower(line), '\\bjavascript\\b'))
       |      AS lkeep
       |  FROM ${pfx}ln),
       |${pfx}cl AS (SELECT id, CAST(count(*) AS BIGINT) AS n_lines,
       |    CAST(SUM(CASE WHEN lkeep THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_lines_kept,
       |    coalesce(string_agg(CASE WHEN lkeep THEN line END,
       |      chr(10) ORDER BY idx), '') AS clean_text
       |  FROM ${pfx}lk GROUP BY id),
       |${pfx}dg AS (SELECT $idCol AS id,
       |    (position('{' IN $textCol) > 0
       |      OR position('}' IN $textCol) > 0) AS has_brace,
       |    position('lorem ipsum' IN lower($textCol)) > 0 AS has_lorem,
       |    $badPred AS has_bad
       |  FROM $rel),
       |${pfx}out AS (SELECT c.id AS $idCol, c.clean_text, c.n_lines,
       |    c.n_lines_kept,
       |    CAST(length(c.clean_text) - length(regexp_replace(
       |      c.clean_text, '[.!?]', '', 'g')) AS BIGINT) AS n_sent,
       |    g.has_brace, g.has_lorem, g.has_bad,
       |    (NOT g.has_brace AND NOT g.has_lorem AND NOT g.has_bad
       |      AND length(c.clean_text) - length(regexp_replace(
       |        c.clean_text, '[.!?]', '', 'g')) >= $minSentences)
       |      AS c4_keep
       |  FROM ${pfx}cl c JOIN ${pfx}dg g ON g.id = c.id)""".stripMargin
  }
}
