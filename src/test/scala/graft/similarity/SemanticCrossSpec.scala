package graft.similarity

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-corpus semantic contamination: planted re-scaled eval copies
  * match their train sources, fresh eval vectors never match, pairs are
  * cross-only even when id spaces overlap, and decontamination drops
  * exactly the matched train docs.
  */
class SemanticCrossSpec extends SparkSpec {

  private def emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    .select(col("vec_id"), col("embedding"))

  private def matches(train: DataFrame, eval: DataFrame,
      nProbe: Int = 2): Seq[(Long, Long)] =
    Similarity.crossCorpusSemanticMatches(train, "vec_id", eval, "vec_id",
        "embedding", threshold = 0.99, c = 8, iters = 1, nProbe = nProbe)
      .select(col("train_id").cast("long"), col("eval_id").cast("long"))
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))

  test("planted scaled copies match their sources; fresh eval items " +
      "never match") {
    val train = emb.filter(col("vec_id") % 5 =!= 1)
    val planted = train.filter(col("vec_id") % 13 === 0)
      .select((col("vec_id") + 1000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
    val fresh = emb.filter(col("vec_id") % 5 === 1)
      .select((col("vec_id") + 9000L).as("vec_id"), col("embedding"))
    val out = matches(train, planted.unionByName(fresh))
    val plantedIds = planted.select(col("vec_id").cast("long"))
      .collect().map(_.getLong(0)).toSet
    // every planted copy is found, matched at least to its own source
    plantedIds.foreach { e =>
      assert(out.exists { case (t, ev) => ev == e && t == e - 1000L },
        s"planted eval $e not matched to its source")
    }
    // fresh (held-out) vectors never match anything
    assert(out.forall(_._2 < 9000L), "a fresh eval item matched")
  }

  test("pairs are cross-only even when id spaces overlap") {
    // eval REUSES train's ids for different vectors: matches must pair
    // by vector content, and no within-corpus duplicate (train holds
    // id 0's vector twice under ids 0 and 777000) may surface as a pair
    val dup = emb.filter(col("vec_id") === 0)
      .select(lit(777000L).as("vec_id"), col("embedding"))
    val train = emb.unionByName(dup)
    val eval = emb.filter(col("vec_id") % 17 === 0) // same ids as train
    val out = matches(train, eval)
    // each eval id e matches its train twin (same vector, cosine 1)
    val evalIds = eval.select(col("vec_id").cast("long"))
      .collect().map(_.getLong(0)).toSet
    evalIds.foreach { e =>
      assert(out.contains((e, e)), s"eval $e missed its identical twin")
    }
    // the within-train duplicate pair (0, 777000) is NOT an output pair
    assert(!out.exists { case (t, e) => t == 777000L && e == 777000L })
  }

  test("decontaminate drops exactly the matched train docs") {
    val train = emb.filter(col("vec_id") % 5 =!= 1)
    val eval = train.filter(col("vec_id") % 13 === 0)
      .select((col("vec_id") + 1000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
    val hit = matches(train, eval).map(_._1).toSet
    assert(hit.nonEmpty)
    val kept = Similarity.decontaminateSemantic(train, "vec_id", eval,
        "vec_id", "embedding", threshold = 0.99, c = 8, iters = 1)
      .select(col("vec_id").cast("long")).collect().map(_.getLong(0)).toSet
    val all = train.select(col("vec_id").cast("long"))
      .collect().map(_.getLong(0)).toSet
    assert(kept == all -- hit)
  }

  test("result is layout-independent") {
    val train = emb.filter(col("vec_id") % 5 =!= 1)
    val eval = train.filter(col("vec_id") % 13 === 0)
      .select((col("vec_id") + 1000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
    val a = matches(train, eval).toSet
    val b = matches(train.repartition(7, col("vec_id")),
      eval.repartition(3)).toSet
    assert(a == b && a.nonEmpty)
  }
}
