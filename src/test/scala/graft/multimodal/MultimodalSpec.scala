package graft.multimodal

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  lazy val docs = Tables(spark, "/root/testdata/sf0.001", "documents")

  test("synthesize produces 16-byte binary payloads with sane metadata") {
    val media = Multimodal.synthesize(docs)
    assert(media.schema("payload").dataType.typeName === "binary")
    val rows = media.collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      assert(r.getAs[Array[Byte]]("payload").length === 16)
      assert(r.getAs[Int]("n_bytes") === 16)
      val (w, h, f) = (r.getAs[Int]("width"), r.getAs[Int]("height"),
        r.getAs[Int]("n_frames"))
      assert(w >= 32 && w <= 1040 && w % 16 === 0)
      assert(h >= 32 && h <= 1040 && h % 16 === 0)
      assert(f >= 1 && f <= 8)
    }
  }

  test("decodeStub runs partition-wise over the typed Dataset") {
    implicit val s = spark
    import s.implicits._
    val media = Multimodal.synthesize(docs).as[Multimodal.Media]
    val feats = Multimodal.decodeStub(media).collect()
    assert(feats.length === 500)
    feats.foreach { f =>
      assert(f.brightness >= 0.0 && f.brightness <= 1.0)
      assert(f.n_bytes === 16)
    }
    // deterministic: same input -> same features
    val again = Multimodal.decodeStub(media).collect()
    assert(feats.sortBy(_.doc_id).toSeq === again.sortBy(_.doc_id).toSeq)
  }

  test("resizeStub preserves aspect, caps the long side, passes small media through") {
    implicit val s = spark
    import s.implicits._
    val media = Multimodal.synthesize(docs).as[Multimodal.Media]
    val resized = Multimodal.resizeStub(media, maxSide = 256).collect()
    val orig = media.collect().map(m => m.doc_id -> m).toMap
    assert(resized.length === orig.size)
    resized.foreach { r =>
      val m = orig(r.doc_id)
      assert(math.max(r.width, r.height) <= 256)
      assert(r.n_bytes === r.payload.length)
      if (math.max(m.width, m.height) <= 256) {
        assert((r.width, r.height) === (m.width, m.height))
        assert(r.payload.toSeq === m.payload.toSeq)
      } else {
        // aspect ratio preserved within rounding
        val scale = 256.0 / math.max(m.width, m.height)
        assert(r.width === math.max(1, math.round(m.width * scale).toInt))
        assert(r.height === math.max(1, math.round(m.height * scale).toInt))
        assert(r.n_bytes <= m.n_bytes)
      }
    }
  }

  test("sampleFrames explodes exactly n_frames rows per doc") {
    val media = Multimodal.synthesize(docs)
    val frames = Multimodal.sampleFrames(media)
    val expected = media.agg(sum("n_frames")).head.getLong(0)
    assert(frames.count() === expected)
    val perDoc = frames.groupBy("doc_id").count()
      .join(media.select(col("doc_id"), col("n_frames")), "doc_id")
      .filter(col("count") =!= col("n_frames"))
    assert(perDoc.count() === 0)
  }

  test("byteFeatures matches JVM-side byte statistics of the payload") {
    val media = Multimodal.synthesize(docs)
    val feats = Multimodal.byteFeatures(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    media.select("doc_id", "payload").collect().foreach { r =>
      val id = r.getLong(0)
      val bytes = r.getAs[Array[Byte]]("payload").map(_ & 0xff)
      val f = feats(id)
      assert(f.getDouble(1) === bytes.sum.toDouble / 16) // mean_byte
      assert(f.getInt(2) === bytes.min && f.getInt(3) === bytes.max)
      assert(f.getLong(4) === bytes.distinct.length.toLong)
      val mass = bytes.groupBy(identity).values.map(g => g.size.toLong * g.size).sum
      assert(f.getLong(5) === mass)
    }
  }
}
