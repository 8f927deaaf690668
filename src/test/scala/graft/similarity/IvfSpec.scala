package graft.similarity

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** IVF coarse quantizer + top-k: determinism, exactness at full probe,
  * and recall at partial probe vs the brute-force oracle.
  */
class IvfSpec extends SparkSpec {

  private def emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")

  test("centroids are deterministic across runs and partitionings") {
    val a = Similarity.ivfCentroids(emb, "vec_id", "embedding", c = 8)
    val b = Similarity.ivfCentroids(emb.repartition(13), "vec_id",
      "embedding", c = 8)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("nProbe = c reproduces brute force exactly") {
    val q = emb.filter(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(q, emb, "vec_id", "embedding", k = 5,
        c = 8, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1))).toSet
    assert(ivf === brute)
  }

  test("index persists through a catalog table and answers identically") {
    import graft.catalog.ParquetCatalog
    val idx = Similarity.IvfIndex.build(emb, "vec_id", "embedding", c = 8)
    val cat = new ParquetCatalog(spark,
      java.nio.file.Files.createTempDirectory("graft-ivf").toString)
    cat.create("ivf_idx", idx.toDF(spark).schema)
    cat.overwrite("ivf_idx", idx.toDF(spark))
    val loaded = Similarity.IvfIndex.fromDF(cat.table("ivf_idx"))
    assert(loaded.centroids.map(_.toSeq).toSeq ===
      idx.centroids.map(_.toSeq).toSeq)
    val q = emb.filter(col("vec_id") < 5)
    val a = idx.topK(q, emb, "vec_id", "embedding", 5, 2).collect()
      .map(r => (r.getLong(0), r.getInt(3), r.getLong(1))).toSet
    val b = loaded.topK(q, emb, "vec_id", "embedding", 5, 2).collect()
      .map(r => (r.getLong(0), r.getInt(3), r.getLong(1))).toSet
    assert(a === b)
  }

  test("portable IVF: deterministic training, recall@10 >= 0.5 at 1/4 probe") {
    val a = Similarity.ivfCentroidsPortable(emb, "vec_id", "embedding", c = 8)
    val b = Similarity.ivfCentroidsPortable(emb.repartition(13), "vec_id",
      "embedding", c = 8)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    val q = emb.filter(col("vec_id") < 20)
    val brute = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopKPortable(q, emb, "vec_id", "embedding",
        k = 10, c = 16, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall $recall")
  }

  test("partial probe keeps recall@10 above 0.5 at 1/4 of the clusters") {
    val q = emb.filter(col("vec_id") < 20)
    val brute = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(q, emb, "vec_id", "embedding", k = 10,
        c = 16, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall $recall")
  }
}
