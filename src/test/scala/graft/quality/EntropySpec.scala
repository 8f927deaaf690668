package graft.quality

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Order-0 entropy gate: planted spew/spam classify correctly, every
  * real document classes 'ok', signals are exact, and the optional
  * CorpusPipeline band drops exactly the planted rows.
  */
class EntropySpec extends SparkSpec {

  private def docs: DataFrame =
    Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))

  test("hand corpus: signals are the exact character histogram") {
    import spark.implicits._
    val d = Seq((1L, "aab"), (2L, "abcd")).toDF("doc_id", "text")
    val sig = Entropy.charSignals(d, "doc_id", "text")
      .orderBy("doc_id").collect()
    // "aab": n=3, distinct=2, coll_num = 2^2 + 1 = 5
    assert(sig(0).getLong(1) === 3 && sig(0).getLong(2) === 2 &&
      sig(0).getLong(3) === 5)
    // "abcd": n=4, distinct=4, coll_num = 4
    assert(sig(1).getLong(1) === 4 && sig(1).getLong(2) === 4 &&
      sig(1).getLong(3) === 4)
  }

  test("empty text produces no row (mirrors generate_series(1,0))") {
    import spark.implicits._
    val d = Seq((1L, ""), (2L, "xy")).toDF("doc_id", "text")
    assert(Entropy.charSignals(d, "doc_id", "text").count() === 1)
  }

  test("repeated boilerplate classes spam, uniform text classes spew") {
    import spark.implicits._
    val d = Seq(
      (1L, "spam " * 40),                       // coll = 1/5
      (2L, ('a' to 'v').mkString * 24)).toDF("doc_id", "text") // uniform 22
    val m = Entropy.gate(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(m(1L) === "spam")
    assert(m(2L) === "spew")
  }

  test("every real document classes ok; gate bounds have margin") {
    val g = Entropy.gate(docs, "doc_id", "text")
    assert(g.filter(col("cls") =!= "ok").count() === 0)
    val mm = g.agg(min(col("coll")), max(col("coll"))).head()
    assert(mm.getDouble(0) > Entropy.SpewNum.toDouble / Entropy.SpewDen)
    assert(mm.getDouble(1) < Entropy.SpamNum.toDouble / Entropy.SpamDen)
  }

  test("CorpusPipeline collisionBand drops planted spew+spam only") {
    import graft.pipeline.CorpusPipeline
    val spew = docs.filter(col("doc_id") % 23 === 0)
      .select((col("doc_id") + 3000000L).as("doc_id"),
        concat((1 to 16).map(i => md5(concat(col("doc_id").cast("string"),
          lit(s":x$i")))): _*).as("text"))
    val spam = docs.filter(col("doc_id") % 29 === 0)
      .select((col("doc_id") + 4000000L).as("doc_id"),
        lit("spam " * 40).as("text"))
    val corpus = docs.unionByName(spew).unionByName(spam)
    val base = CorpusPipeline.clean(corpus, "doc_id", "text",
      CorpusPipeline.Config(minQuality = 0.0, languages =
        Seq("en", "de", "fr", "es", "und")))
    val banded = CorpusPipeline.clean(corpus, "doc_id", "text",
      CorpusPipeline.Config(minQuality = 0.0, languages =
        Seq("en", "de", "fr", "es", "und"),
        collisionBand = Some((Entropy.SpewNum, Entropy.SpewDen,
          Entropy.SpamNum, Entropy.SpamDen))))
    val dropped = base.select("doc_id").exceptAll(banded.select("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(dropped.nonEmpty)
    assert(dropped.forall(id => id >= 3000000L))
  }
}
