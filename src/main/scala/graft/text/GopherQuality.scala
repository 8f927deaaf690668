package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher document-level QUALITY rules (Rae et al. 2021, Table A1) —
  * the heuristic gate family the q46 pipeline's length/punct/stopword
  * score approximates, spelled out as the published per-rule
  * thresholds. The round-13 `Repetition.fineSignals` covers the
  * REPETITION half of that table; this is the quality half:
  *
  *   - word count in [minTok, maxTok] (50..100000 default);
  *   - mean word length in [3, 10] characters;
  *   - symbol-to-word ratio (`#` or `...`) ≤ 0.1;
  *   - ≤ 90% of lines starting with a bullet (`-`/`*`);
  *   - ≤ 30% of lines ending with an ellipsis;
  *   - ≥ 80% of words containing ≥ 1 alphabetic character;
  *   - ≥ 2 distinct Gopher STOP WORDS present
  *     (the/be/to/of/and/that/have/with).
  *
  * Every GATE comparison is exact-integer (`10·sym ≤ n_tok`, never a
  * double threshold), so the keep decision replays bit-identically in
  * DuckDB; the reported fractions are each ONE final double division.
  * Scale shape: one token explode + one line explode, both doc-keyed
  * aggregates — no cross-doc state anywhere (the per-doc family
  * contract, so the streaming front door could apply it
  * batch-at-a-time).
  */
object GopherQuality {

  /** Table A1's "must contain ≥ 2 of" stop-word list. */
  val StopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Per-document signals + the keep gate — `(idCol, n_tok,
    * mean_word_len, symbol_ratio, bullet_frac, ellipsis_frac,
    * alpha_frac, n_stop, gopher_keep)`, one row per input document
    * (empty docs report zeros and fail the word-count rule).
    */
  def signals(docs: DataFrame, idCol: String, textCol: String,
      minTok: Long = 50L, maxTok: Long = 100000L,
      stopwords: Seq[String] = StopWords): DataFrame = {
    val id = col(idCol)
    def frac(num: Column, den: Column): Column =
      when(den > 0, num.cast("double") / den.cast("double"))
        .otherwise(lit(0.0))

    // scan 1: the symbol counts (per-row length arithmetic —
    // replace-all both engines; each `...` removal is exactly 3 chars
    // so diff div 3 is exact) RIDE the token explode's input, and
    // `explode_outer` keeps token-less docs as one null-token row —
    // the id spine, the token aggregate, and the symbol counts in ONE
    // pass over the docs relation instead of three
    val tokAgg = docs.select(id,
        (length(col(textCol)) -
          length(regexp_replace(col(textCol), "#", "")))
          .cast("long").as("n_hash"),
        expr(s"CAST((length($textCol) - length(regexp_replace(" +
          s"$textCol, '\\\\.\\\\.\\\\.', ''))) div 3 AS BIGINT)")
          .as("n_edots"),
        explode_outer(TextAnalysis.tokens(col(textCol))).as("tok"))
      .groupBy(id).agg(
        count(col("tok")).as("n_tok"),
        coalesce(sum(length(col("tok")).cast("long")), lit(0L))
          .as("sum_len"),
        coalesce(sum(when(col("tok").rlike("[A-Za-z]"), 1L)
          .otherwise(0L)), lit(0L)).as("n_alpha"),
        countDistinct(when(lower(col("tok")).isin(stopwords: _*),
          lower(col("tok")))).as("n_stop"),
        max(col("n_hash")).as("n_hash"),
        max(col("n_edots")).as("n_edots"))

    // scan 2: the line explode (a different grain — can't ride scan 1)
    val lines = docs
      .select(id, explode(split(col(textCol), "\n")).as("line"))
      .filter(length(trim(col("line"))) > 0)
    val lineAgg = lines.groupBy(id).agg(
      count(lit(1)).as("n_lines"),
      sum(when(trim(col("line")).rlike("^[-*]"), 1L).otherwise(0L))
        .as("n_bullet"),
      sum(when(col("line").rlike("\\.\\.\\.\\s*$"), 1L).otherwise(0L))
        .as("n_ellip"))

    val z = lit(0L)
    tokAgg
      .join(lineAgg, Seq(idCol), "left")
      .select(id,
        col("n_tok"), col("sum_len"), col("n_alpha"), col("n_stop"),
        coalesce(col("n_lines"), z).as("n_lines"),
        coalesce(col("n_bullet"), z).as("n_bullet"),
        coalesce(col("n_ellip"), z).as("n_ellip"),
        col("n_hash"), col("n_edots"))
      .select(id, col("n_tok"),
        frac(col("sum_len"), col("n_tok")).as("mean_word_len"),
        frac(col("n_hash") + col("n_edots"), col("n_tok"))
          .as("symbol_ratio"),
        frac(col("n_bullet"), col("n_lines")).as("bullet_frac"),
        frac(col("n_ellip"), col("n_lines")).as("ellipsis_frac"),
        frac(col("n_alpha"), col("n_tok")).as("alpha_frac"),
        col("n_stop"),
        // every clause exact-integer — the keep bit replays bit-exactly
        (col("n_tok") >= minTok && col("n_tok") <= maxTok &&
          col("sum_len") >= lit(3L) * col("n_tok") &&
          col("sum_len") <= lit(10L) * col("n_tok") &&
          lit(10L) * (col("n_hash") + col("n_edots")) <= col("n_tok") &&
          lit(10L) * col("n_bullet") <= lit(9L) * col("n_lines") &&
          lit(10L) * col("n_ellip") <= lit(3L) * col("n_lines") &&
          lit(10L) * col("n_alpha") >= lit(8L) * col("n_tok") &&
          col("n_stop") >= 2L).as("gopher_keep"))
  }

  /** DuckDB CTE chain for [[signals]] over `rel(idCol, textCol)`,
    * ending in `<pfx>sig` with [[signals]]' exact output columns.
    */
  def signalsCtes(rel: String, idCol: String, textCol: String,
      minTok: Long = 50L, maxTok: Long = 100000L,
      pfx: String = "gq",
      stopwords: Seq[String] = StopWords): String = {
    val stops = stopwords
      .map(s => s"'${graft.graph.WebGraph.sqlLit(s)}'").mkString(", ")
    s"""${pfx}tk AS (SELECT $idCol AS id, unnest(list_filter(
       |    string_split_regex($textCol, '\\s+'), x -> x <> '')) AS tok
       |  FROM $rel),
       |${pfx}ta AS (SELECT id, CAST(count(*) AS BIGINT) AS n_tok,
       |    CAST(SUM(length(tok)) AS BIGINT) AS sum_len,
       |    CAST(SUM(CASE WHEN regexp_matches(tok, '[A-Za-z]') THEN 1 ELSE 0 END) AS BIGINT) AS n_alpha,
       |    CAST(COUNT(DISTINCT CASE WHEN lower(tok) IN ($stops) THEN lower(tok) END) AS BIGINT) AS n_stop
       |  FROM ${pfx}tk GROUP BY id),
       |${pfx}ln AS (SELECT $idCol AS id,
       |    unnest(string_split($textCol, chr(10))) AS line
       |  FROM $rel),
       |${pfx}la AS (SELECT id, CAST(count(*) AS BIGINT) AS n_lines,
       |    CAST(SUM(CASE WHEN regexp_matches(trim(line), '^[-*]') THEN 1 ELSE 0 END) AS BIGINT) AS n_bullet,
       |    CAST(SUM(CASE WHEN regexp_matches(line, '\\.\\.\\.\\s*$$') THEN 1 ELSE 0 END) AS BIGINT) AS n_ellip
       |  FROM ${pfx}ln WHERE length(trim(line)) > 0 GROUP BY id),
       |${pfx}sy AS (SELECT $idCol AS id,
       |    CAST(length($textCol) - length(replace($textCol, '#', '')) AS BIGINT) AS n_hash,
       |    CAST((length($textCol) - length(regexp_replace($textCol, '\\.\\.\\.', '', 'g'))) // 3 AS BIGINT) AS n_edots
       |  FROM $rel),
       |${pfx}j AS (SELECT d.$idCol AS id,
       |    coalesce(t.n_tok, 0) AS n_tok, coalesce(t.sum_len, 0) AS sum_len,
       |    coalesce(t.n_alpha, 0) AS n_alpha, coalesce(t.n_stop, 0) AS n_stop,
       |    coalesce(l.n_lines, 0) AS n_lines, coalesce(l.n_bullet, 0) AS n_bullet,
       |    coalesce(l.n_ellip, 0) AS n_ellip,
       |    coalesce(s.n_hash, 0) AS n_hash, coalesce(s.n_edots, 0) AS n_edots
       |  FROM $rel d
       |  LEFT JOIN ${pfx}ta t ON t.id = d.$idCol
       |  LEFT JOIN ${pfx}la l ON l.id = d.$idCol
       |  LEFT JOIN ${pfx}sy s ON s.id = d.$idCol),
       |${pfx}sig AS (SELECT id AS $idCol, n_tok,
       |    CASE WHEN n_tok > 0 THEN CAST(sum_len AS DOUBLE) / CAST(n_tok AS DOUBLE) ELSE 0.0 END AS mean_word_len,
       |    CASE WHEN n_tok > 0 THEN CAST(n_hash + n_edots AS DOUBLE) / CAST(n_tok AS DOUBLE) ELSE 0.0 END AS symbol_ratio,
       |    CASE WHEN n_lines > 0 THEN CAST(n_bullet AS DOUBLE) / CAST(n_lines AS DOUBLE) ELSE 0.0 END AS bullet_frac,
       |    CASE WHEN n_lines > 0 THEN CAST(n_ellip AS DOUBLE) / CAST(n_lines AS DOUBLE) ELSE 0.0 END AS ellipsis_frac,
       |    CASE WHEN n_tok > 0 THEN CAST(n_alpha AS DOUBLE) / CAST(n_tok AS DOUBLE) ELSE 0.0 END AS alpha_frac,
       |    n_stop,
       |    (n_tok >= $minTok AND n_tok <= $maxTok
       |      AND sum_len >= 3 * n_tok AND sum_len <= 10 * n_tok
       |      AND 10 * (n_hash + n_edots) <= n_tok
       |      AND 10 * n_bullet <= 9 * n_lines
       |      AND 10 * n_ellip <= 3 * n_lines
       |      AND 10 * n_alpha >= 8 * n_tok
       |      AND n_stop >= 2) AS gopher_keep
       |  FROM ${pfx}j)""".stripMargin
  }
}
