package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The SQL front door for composite operators: each TVF, driven purely
  * through `spark.sql` over temp views, must return exactly what the
  * Scala API path returns.
  */
class GraftTvfSpec extends SparkSpec {
  import spark.implicits._

  GraftExtensions.register(spark)

  private lazy val docs: DataFrame = (1L to 60L).map { i =>
    val base = i % 20
    (i, s"shared text body number $base with repeated words number $base " +
      s"and a tail marker $base here")
  }.toDF("doc_id", "text")

  private lazy val vecs: DataFrame = (0L until 80L).map { i =>
    val rnd = new scala.util.Random(42 + i)
    (i, Array.fill(16)(rnd.nextFloat() - 0.5f))
  }.toDF("vec_id", "embedding")

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("graft_near_duplicates TVF == Dedup.minhashNearDuplicates") {
    docs.createOrReplaceTempView("tvf_docs")
    val sql = spark.sql(
      "SELECT * FROM graft_near_duplicates('tvf_docs', 'doc_id', 'text', 0.5) " +
        "ORDER BY a, b")
    val api = graft.dedup.Dedup
      .minhashNearDuplicates(docs, "doc_id", "text", 0.5)
      .orderBy(col("a"), col("b"))
    assert(sql.columns.toSeq == api.columns.toSeq)
    val got = rows(sql)
    assert(got.nonEmpty && got == rows(api))
  }

  test("graft_ann_topk TVF == Similarity.ivfPqTopKRefined") {
    vecs.createOrReplaceTempView("tvf_corpus")
    vecs.filter($"vec_id" < 5).createOrReplaceTempView("tvf_queries")
    val sql = spark.sql(
      "SELECT * FROM graft_ann_topk('tvf_queries', 'tvf_corpus', " +
        "'vec_id', 'embedding', 3) ORDER BY q_id, rank")
    val api = graft.similarity.Similarity.ivfPqTopKRefined(
        vecs.filter($"vec_id" < 5), vecs, "vec_id", "embedding", 3)
      .orderBy(col("q_id"), col("rank"))
    val got = rows(sql)
    assert(got.nonEmpty && got == rows(api))
  }

  test("graft_pack_sequences TVF == Packing.packSequences") {
    docs.createOrReplaceTempView("tvf_docs")
    val sql = spark.sql(
      "SELECT * FROM graft_pack_sequences('tvf_docs', 'doc_id', 'text', " +
        "32, 4) ORDER BY doc_id")
    val api = graft.pipeline.Packing
      .packSequences(docs, "doc_id", "text", 32, 4)
      .orderBy(col("doc_id"))
    val got = rows(sql)
    assert(got.nonEmpty && got == rows(api))
  }

  test("TVFs compose inside larger SQL (join + aggregate over the TVF)") {
    docs.createOrReplaceTempView("tvf_docs")
    val n = spark.sql(
      """SELECT count(*) AS n FROM graft_near_duplicates('tvf_docs',
        |  'doc_id', 'text', 0.5) p
        |JOIN tvf_docs d ON d.doc_id = p.a
        |WHERE p.jaccard >= 0.5""".stripMargin)
      .collect().head.getLong(0)
    val api = graft.dedup.Dedup
      .minhashNearDuplicates(docs, "doc_id", "text", 0.5).count()
    assert(n == api)
  }

  test("non-literal and malformed TVF arguments fail with a clear error") {
    docs.createOrReplaceTempView("tvf_docs")
    val e = intercept[Exception] {
      spark.sql(
        "SELECT * FROM graft_near_duplicates('tvf_docs', 'doc_id')")
        .collect()
    }
    assert(e.getMessage.contains("graft_near_duplicates"))
  }
}
