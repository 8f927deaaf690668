package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, quality signals, language ID, fingerprinting. All pure
  * column expressions (`org.apache.spark.sql.functions`) — codegen'd,
  * no UDFs, trivially distributed: every signal is computed row-local, so
  * the operators scale linearly with no shuffle at all until the caller
  * aggregates.
  *
  * Each helper has an exact DuckDB-SQL equivalent used by the oracle
  * queries (see PipelineQueries), so semantics are pinned cross-engine.
  */
object TextAnalysis {

  /** Whitespace tokens, empty strings dropped. Semantically identical to
    * `filter(split(text,'\s+'), _ != "")` (the DuckDB oracle's
    * formulation) for every input, but expressed as collapse-trim-split
    * so it stays inside whole-stage codegen — a `filter` lambda is
    * CodegenFallback and the single biggest cost in every token path.
    */
  def tokens(text: Column): Column = {
    val norm = trim(regexp_replace(text, "\\s+", " "))
    when(length(norm) === 0, array().cast("array<string>"))
      .otherwise(split(norm, " "))
  }

  /** One-pass (n_tokens, sum_len, n_stop) struct — the native
    * [[graft.functions.TokenStats]] expression; the composed
    * filter/aggregate lambdas it replaces are CodegenFallback.
    */
  private def stats(text: Column, stopwords: Seq[String]): Column =
    graft.functions.TextHash.tokenStats(text, stopwords)

  def tokenCount(text: Column): Column =
    stats(text, Nil).getField("n_tokens")

  /** Mean token length; exact integer arithmetic until one final double
    * division.
    */
  def avgWordLen(text: Column): Column = {
    val st = stats(text, Nil)
    st.getField("sum_len").cast("double") /
      greatest(st.getField("n_tokens"), lit(1))
  }

  /** Share of characters that are neither alphanumeric nor whitespace. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[A-Za-z0-9\\s]", "")).cast("double") /
      greatest(length(text), lit(1))

  /** Share of tokens found in a stopword list (lowercased compare). */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val st = stats(text, stopwords)
    st.getField("n_stop").cast("double") /
      greatest(st.getField("n_tokens"), lit(1))
  }

  /** Composite quality score in [0,1]: length sanity + stopword presence
    * - punctuation noise. Heuristic but fully deterministic.
    */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val st = stats(text, stopwords)
    val n = st.getField("n_tokens")
    val lengthOk = when(n.between(5, 5000), lit(0.4)).otherwise(lit(0.0))
    val stopOk = when(st.getField("n_stop").cast("double")
      / greatest(n, lit(1)) > 0.01, lit(0.3)).otherwise(lit(0.0))
    val punctOk = when(punctRatio(text) < 0.2, lit(0.3)).otherwise(lit(0.0))
    lengthOk + stopOk + punctOk
  }

  /** Stopword seed lists for the n-gram-free language-ID heuristic. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "und", "ist", "das"),
    "fr" -> Seq("le", "la", "et", "est", "les"),
    "es" -> Seq("el", "los", "y", "es", "una"))

  /** Predicted language: argmax of marker-word occurrence counts, ties
    * broken by marker order (language code ascending), no hits -> "und".
    * Computed by the native single-pass [[graft.functions.LangIdNative]]
    * expression (one text walk for all languages); [[langIdRegex]] is the
    * regex formulation it bit-matches (= the q17 oracle's shape), kept
    * for the parity test.
    */
  def langId(text: Column): Column =
    graft.functions.LangIdNative.langId(text)

  /** Regex marker-count formulation of [[langId]]: one `\b(..|..)\b`
    * alternation scan per language, array argmax (not a when/otherwise
    * fold — a fold duplicates the running-best expression tree
    * exponentially).
    */
  def langIdRegex(text: Column): Column = {
    val lowered = lower(text)
    val hits = langMarkers.map { case (_, words) =>
      // one alternation per language (word matches are disjoint, so the
      // count equals the sum of per-word counts at 1/5 the scan cost)
      regexp_count(lowered, lit(words.mkString("\\b(", "|", ")\\b")))
    }
    val arr = array(hits: _*)
    val codes = array(langMarkers.map(m => lit(m._1)): _*)
    val top = array_max(arr)
    when(top > 0,
      element_at(codes, array_position(arr, top).cast("int")))
      .otherwise(lit("und"))
  }

  /** Canonical form for exact-dup detection: lowercase, strip
    * non-alphanumerics, collapse whitespace.
    */
  def normalized(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]", ""),
      "\\s+", " "))

  /** Deterministic 128-bit content fingerprint of the normalized text. */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** Unicode-aware canonical form (opt-in; [[normalized]] keeps its
    * a-z-only contract for the existing oracle queries): NFC
    * composition (native codegen [[graft.functions.UnicodeNorm]]) so
    * composed and decomposed spellings coincide, lowercase, keep
    * Unicode letters/digits (`\p{L}\p{N}` — non-Latin text SURVIVES
    * instead of degrading to whitespace), collapse whitespace. The
    * character classes are identical in Java regex and DuckDB's RE2,
    * and NFC is NFC in both engines (UAX #15), so the form replays
    * bit-identically: `trim(regexp_replace(regexp_replace(
    * lower(nfc_normalize(t)), '[^\p{L}\p{N}\s]', '', 'g'),
    * '\s+', ' ', 'g'))`.
    */
  def normalizedUnicode(text: Column): Column =
    trim(regexp_replace(regexp_replace(
      lower(graft.functions.UnicodeNorm.nfc(text)),
      "[^\\p{L}\\p{N}\\s]", ""), "\\s+", " "))

  /** [[fingerprint]] over the Unicode canonical form: NFC/NFD variant
    * spellings of the same text get ONE fingerprint.
    */
  def fingerprintUnicode(text: Column): Column = md5(normalizedUnicode(text))
}
