package graft.dedup

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-corpus near-dup matching (train-vs-eval contamination) and
  * the decontamination anti-join built on it.
  */
class CrossCorpusSpec extends SparkSpec {

  private def docs: DataFrame =
    Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))

  /** Eval set: exact copies of %13 train docs, near copies of %17,
    * and wholly fresh synthetic docs that must never match.
    */
  private def eval: DataFrame =
    docs.filter(col("doc_id") % 13 === 0)
      .select((col("doc_id") + 5000000L).as("doc_id"), col("text"))
      .unionByName(docs.filter(col("doc_id") % 17 === 0)
        .select((col("doc_id") + 6000000L).as("doc_id"),
          concat(col("text"), lit(" zz tail marker")).as("text")))
      .unionByName(docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 7000000L).as("doc_id"),
          concat(lit("fresh eval doc "), col("doc_id").cast("string"),
            lit(" with wholly unique content")).as("text")))

  test("planted contamination is found; fresh eval docs never match") {
    val m = Dedup.crossCorpusMatches(docs, "doc_id", "text",
      eval, "doc_id", "text").collect()
    val exactIds = docs.filter(col("doc_id") % 13 === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // every exact copy matches its source at jaccard 1.0
    exactIds.foreach { id =>
      assert(m.exists(r => r.getLong(0) == id &&
        r.getLong(1) == id + 5000000L && r.getDouble(2) == 1.0),
        s"exact copy of $id not matched")
    }
    // fresh docs (+7000000 range) never appear on the eval side
    assert(!m.exists(_.getLong(1) >= 7000000L))
    // matches are strictly cross-corpus: a is a train id, b an eval id
    assert(m.forall(r => r.getLong(0) < 5000000L && r.getLong(1) >= 5000000L))
    // near copies (appended marker) surface too
    assert(m.exists(r => r.getLong(1) >= 6000000L && r.getLong(1) < 7000000L))
  }

  test("overlapping id spaces stay cross-only (no self pairs)") {
    // eval reuses the TRAIN ids verbatim: every doc must match itself
    // across the corpora — the self-join's a<b filter would drop these
    val m = Dedup.crossCorpusMatches(docs, "doc_id", "text",
      docs, "doc_id", "text").collect()
    val n = docs.count()
    assert(m.count(r => r.getLong(0) == r.getLong(1) &&
      r.getDouble(2) == 1.0) == n)
  }

  test("decontaminateNearDup removes exactly the matched train docs") {
    val matched = Dedup.crossCorpusMatches(docs, "doc_id", "text",
      eval, "doc_id", "text")
      .select("a").distinct().collect().map(_.getLong(0)).toSet
    val kept = Dedup.decontaminateNearDup(docs, "doc_id", "text",
      eval, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val all = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == all -- matched)
    assert(matched.nonEmpty && kept.nonEmpty)
  }
}
