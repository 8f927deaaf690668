package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Trained char-trigram language ID: fit/apply separation on a
  * planted two-language fixture, deterministic tie-break, the
  * pipeline gate wiring, and the short-doc contract.
  */
class LangClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def cipher(s: String): String =
    s.map {
      case c if c >= 'a' && c <= 'y' => ('a' + ('y' - c)).toChar
      case c => c
    }

  private val enDocs = Seq(
    "the cat sat on the mat and the dog is here",
    "a list of words and the usual suspects of prose",
    "this is the kind of sentence a corpus is made of",
    "and of course the other one is a bit longer here")

  test("separates a substitution-ciphered class the marker regex " +
      "cannot name") {
    val fx = (enDocs.zipWithIndex.map { case (t, i) =>
      (i.toLong * 2, t, "en") } ++
      enDocs.zipWithIndex.map { case (t, i) =>
        (i.toLong * 2 + 1, cipher(t), "xx") })
      .toDF("id", "text", "lang_true")
    val model = LangClassifier.fit(
      fx.filter(col("id") < 4), "id", "lang_true", "text")
    val pred = LangClassifier.classify(fx, "id", "text", model)
    val joined = fx.join(pred, Seq("id"))
    assert(joined.filter(col("lang_true") =!= col("lang_trained"))
      .count() == 0)
    // the regex argmax misses the ciphered class entirely
    val rx = fx.filter(col("lang_true") === "xx")
      .select(TextAnalysis.langId(col("text")).as("r"))
      .collect().map(_.getString(0))
    assert(rx.forall(_ != "xx"))
  }

  test("native codegen scorer == relational path bit-for-bit") {
    val fx = (enDocs.zipWithIndex.map { case (t, i) =>
      (i.toLong * 2, t, "en") } ++
      enDocs.zipWithIndex.map { case (t, i) =>
        (i.toLong * 2 + 1, cipher(t), "xx") })
      .toDF("id", "text", "lang_true")
    val model = LangClassifier.fit(
      fx.filter(col("id") < 4), "id", "lang_true", "text")
    val docs = fx.select(col("id"), col("text"))
    val a = LangClassifier.classify(docs, "id", "text", model)
      .orderBy(col("id")).collect().toSeq.map(_.toSeq)
    val b = LangClassifier.classifyRelational(docs, "id", "text", model)
      .orderBy(col("id")).collect().toSeq.map(_.toSeq)
    assert(a.nonEmpty && a == b)
  }

  test("tie-break is label-ascending and deterministic") {
    val fx = Seq((1L, "abcabc", "aa"), (2L, "abcabc", "bb"))
      .toDF("id", "text", "label")
    val model = LangClassifier.fit(fx, "id", "label", "text")
    // identical training text per label -> identical costs -> 'aa'
    val p = LangClassifier.classify(
      Seq((9L, "abcabc")).toDF("id", "text"), "id", "text", model)
      .head()
    assert(p.getString(1) == "aa")
  }

  test("documents under 3 chars produce no verdict (contract)") {
    val seeds = Seq((1L, "en", "the cat"), (2L, "xx", "gsv xzg"))
      .toDF("id", "label", "text")
    val model = LangClassifier.fit(seeds, "id", "label", "text")
    val out = LangClassifier.classify(
      Seq((5L, "ab"), (6L, "abc")).toDF("id", "text"),
      "id", "text", model)
    assert(out.select(col("id")).as[Long].collect().toSeq == Seq(6L))
  }

  test("pipeline langGateStage keeps exactly the keep-set labels and " +
      "rowGates skips the regex filter when configured") {
    import graft.pipeline.CorpusPipeline
    val base = enDocs.zipWithIndex.map { case (t, i) =>
      (i.toLong * 2, t + " " + t) } // long enough for the quality gate
    val fx = (base ++ base.map { case (i, t) => (i + 1, cipher(t)) })
      .toDF("doc_id", "text")
    val seeds = Seq((0L, "en", enDocs.head + " " + enDocs.head),
      (1L, "xx", cipher(enDocs.head + " " + enDocs.head)))
      .toDF("doc_id", "label", "text")
    val model = LangClassifier.fit(seeds, "doc_id", "label", "text")
    val cfg = CorpusPipeline.Config(minQuality = 0.4,
      langGate = Some(CorpusPipeline.LangGate(model, Seq("en"))))
    val gated = CorpusPipeline.rowGates(fx, "doc_id", "text", cfg)
    // ciphered docs survive rowGates (no regex filter when gate set)
    assert(gated.count() == fx.count())
    val banded = CorpusPipeline.langGateStage(gated, "doc_id", "text",
      cfg)
    assert(banded.select(col("doc_id")).as[Long].collect().toSet ==
      base.map(_._1).toSet)
  }
}
