package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained character-trigram language identifier — the fit/apply
  * upgrade of [[TextAnalysis.langId]]'s marker-word argmax (reference
  * scope: none — north-star text-quality family; the design is the
  * public fastText/langdetect shape reduced to exact integers).
  *
  * The marker heuristic only sees five stopwords per language: text in
  * an unlisted language (or any transform that destroys the markers)
  * falls to "und", and a doc that HAPPENS to contain "a"/"is" claims
  * "en". The trained gate scores EVERY character trigram against
  * per-label corpus statistics, so it separates languages the markers
  * cannot name — the q284 fixture plants a substitution-ciphered class
  * that the regex argmax misclassifies ~100% of the time and the
  * trained model separates exactly.
  *
  * EXACT-INTEGER scoring (the Dsir/backoff posture — no floats, so
  * DuckDB replays bit-identically): per label l the cost of trigram g
  * is `bitlen((total_l + V) div (cnt_l(g) + 1))` — an integer proxy
  * for −log2 of the add-one-smoothed probability (V = distinct
  * trigram count across ALL labels, so smoothing mass is symmetric);
  * unseen trigrams cost the label's ceiling `bitlen(total_l + V)`.
  * A document's label cost is the sum over its trigram OCCURRENCES;
  * prediction is the argmin, ties broken by label ascending. bitlen
  * is `length(bin(x))` in BOTH engines.
  *
  * Scale: the model is vocabulary-sized (≤ |alphabet|³ per label) and
  * broadcast; scoring is one explode + broadcast join + per-doc sum —
  * no shuffle wider than the doc-keyed aggregation. Per-doc against
  * frozen state, so batch-at-a-time == one-shot and the streaming
  * front door applies it unchanged (the q133 classifier argument).
  */
object LangClassifier {

  /** Frozen fitted model: `weights(label, tri, w)` and
    * `defaults(label, wdef)` — both model-sized, localCheckpoint'd at
    * fit time (training is an action; the apply side never recomputes
    * it) — plus the collected NATIVE model
    * ([[graft.functions.LangScore.Model]]) the codegen scorer
    * references.
    */
  case class Model(weights: DataFrame, defaults: DataFrame,
      native: graft.functions.LangScore.Model)

  /** One row per character-trigram OCCURRENCE: `(<idCol>, tri)`.
    * Documents shorter than 3 characters contribute nothing (and are
    * therefore absent from [[classify]]'s output — callers gate on
    * length first if they need a verdict for them).
    */
  def trigrams(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.filter(length(col(textCol)) >= 3)
      .select(col(idCol), explode(expr(
        s"transform(sequence(1, length($textCol) - 2)," +
          s" i -> substring($textCol, i, 3))")).as("tri"))

  private def bitlen(c: Column): Column = length(bin(c)).cast("long")

  /** Fit per-label trigram costs from a labeled seed relation
    * `seeds(idCol, labelCol, textCol)`. Two driver-side scalars (V and
    * the checkpoint) — both model-sized actions, the fit IS the
    * action.
    */
  def fit(seeds: DataFrame, idCol: String, labelCol: String,
      textCol: String): Model = {
    val st = trigrams(seeds.select(col(idCol), col(labelCol),
        col(textCol)), idCol, textCol)
      .join(seeds.select(col(idCol), col(labelCol)), Seq(idCol))
      .select(col(labelCol).as("label"), col("tri"))
    val counts = st.groupBy(col("label"), col("tri"))
      .agg(count(lit(1)).as("__cnt"))
    val totals = st.groupBy(col("label"))
      .agg(count(lit(1)).as("__total"))
    val v = st.select(col("tri")).distinct().count()
    val weights = counts.join(totals, Seq("label"))
      .select(col("label"), col("tri"),
        bitlen(expr(s"(__total + $v) div (__cnt + 1)")).as("w"))
      .localCheckpoint()
    val defaults = totals
      .select(col("label"), bitlen(col("__total") + v).as("wdef"))
      .localCheckpoint()
    // collect the model-sized relations once into the native scorer
    val native = graft.functions.LangScore.build(
      defaults.collect().map(r => (r.getString(0), r.getLong(1))).toSeq,
      weights.collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq)
    Model(weights, defaults, native)
  }

  /** Predicted label per document: `(<idCol>, lang_trained, cost)` —
    * argmin label cost, ties by label ascending. ONE referenced-object
    * codegen scan ([[graft.functions.LangScore]]): no trigram explode,
    * no join, no shuffle — the gate rides the scan. Bit-equal to
    * [[classifyRelational]] (parity-tested in LangClassifierSpec).
    */
  def classify(docs: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame =
    docs.filter(length(col(textCol)) >= 3)
      .select(col(idCol),
        graft.functions.LangScore.scoreCol(col(textCol), model.native)
          .as("__s"))
      .select(col(idCol),
        col("__s").getField("lang_trained").as("lang_trained"),
        col("__s").getField("cost").as("cost"))

  /** The relational formulation of [[classify]] (explode + broadcast
    * join + per-doc min-struct) — kept as the parity spec for the
    * native scorer; same output bit-for-bit.
    */
  def classifyRelational(docs: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame =
    trigrams(docs, idCol, textCol)
      .crossJoin(broadcast(model.defaults))
      .join(broadcast(model.weights), Seq("label", "tri"), "left")
      .select(col(idCol), col("label"),
        coalesce(col("w"), col("wdef")).as("__w"))
      .groupBy(col(idCol), col("label"))
      .agg(sum(col("__w")).as("__cost"))
      .groupBy(col(idCol))
      .agg(min(struct(col("__cost"), col("label"))).as("__best"))
      .select(col(idCol),
        col("__best").getField("label").as("lang_trained"),
        col("__best").getField("__cost").as("cost"))

  /** DuckDB CTE chain replaying fit + classify: seeds from
    * `seedsRel(id, label, text)`, scoring over `docsRel(id, text)`,
    * ending in `<pfx>pred(id, lang_trained, cost)`. SUMs cast to
    * BIGINT (HUGEINT hazard); same bitlen/div/tie-break as the
    * engine.
    */
  def classifyCtes(seedsRel: String, docsRel: String,
      pfx: String = "lc"): String =
    s"""${pfx}st AS (SELECT label,
       |    substring(text, gi, 3) AS tri
       |  FROM (SELECT label, text,
       |      unnest(generate_series(1, length(text) - 2)) AS gi
       |    FROM $seedsRel WHERE length(text) >= 3)),
       |${pfx}cnt AS (SELECT label, tri, CAST(count(*) AS BIGINT) AS cnt
       |  FROM ${pfx}st GROUP BY 1, 2),
       |${pfx}tot AS (SELECT label, CAST(count(*) AS BIGINT) AS total
       |  FROM ${pfx}st GROUP BY 1),
       |${pfx}vv AS (SELECT CAST(count(DISTINCT tri) AS BIGINT) AS v
       |  FROM ${pfx}st),
       |${pfx}w AS (SELECT c.label, c.tri,
       |    CAST(length(bin((t.total + vv.v) // (c.cnt + 1))) AS BIGINT) AS w
       |  FROM ${pfx}cnt c JOIN ${pfx}tot t ON t.label = c.label
       |  CROSS JOIN ${pfx}vv vv),
       |${pfx}def AS (SELECT t.label,
       |    CAST(length(bin(t.total + vv.v)) AS BIGINT) AS wdef
       |  FROM ${pfx}tot t CROSS JOIN ${pfx}vv vv),
       |${pfx}dt AS (SELECT id, substring(text, gi, 3) AS tri
       |  FROM (SELECT id, text,
       |      unnest(generate_series(1, length(text) - 2)) AS gi
       |    FROM $docsRel WHERE length(text) >= 3)),
       |${pfx}cost AS (SELECT d.id, l.label,
       |    CAST(SUM(COALESCE(w.w, l.wdef)) AS BIGINT) AS cost
       |  FROM ${pfx}dt d CROSS JOIN ${pfx}def l
       |  LEFT JOIN ${pfx}w w ON w.label = l.label AND w.tri = d.tri
       |  GROUP BY 1, 2),
       |${pfx}pred AS (SELECT id, label AS lang_trained, cost FROM (
       |  SELECT id, label, cost,
       |    row_number() OVER (PARTITION BY id
       |      ORDER BY cost, label) AS rn
       |  FROM ${pfx}cost) t WHERE rn = 1)""".stripMargin
}
