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

  test("Bmp codec round-trips pixel data exactly, incl. padded rows") {
    // widths 3 and 5 force 4-byte row padding (9->12, 15->16 bytes);
    // width 4 is the unpadded case
    for ((w, h) <- Seq((3, 2), (5, 4), (4, 3), (1, 1), (16, 16))) {
      val rgb = Array.tabulate(w * h * 3)(i => ((i * 7 + 13) % 256).toByte)
      val enc = Bmp.encode(Bmp.Image(w, h, rgb))
      assert(enc(0) === 'B'.toByte && enc(1) === 'M'.toByte)
      val rowStride = (w * 3 + 3) / 4 * 4
      assert(enc.length === Bmp.HeaderSize + rowStride * h)
      val dec = Bmp.decode(enc)
      assert(dec.width === w && dec.height === h)
      assert(dec.rgb.toSeq === rgb.toSeq)
    }
    // malformed input is rejected loudly, not decoded plausibly
    intercept[IllegalArgumentException](Bmp.decode(Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException](
      Bmp.decode(Array.fill[Byte](54)(0)))
  }

  test("decode parses real BMP payloads back to the generated content") {
    implicit val s = spark
    val media = Multimodal.synthesizeBmp(docs)
    val feats = Multimodal.decode(media).collect()
    assert(feats.length === 500)
    feats.foreach { f =>
      assert(f.width >= 1 && f.width <= 16)
      assert(f.height >= 1 && f.height <= 16)
      assert(f.n_pixel_bytes === f.width * f.height * 3)
      // brightness equals the generative formula mean((doc_id+i)%256)/255
      val n = f.n_pixel_bytes
      val sum = (0 until n).map(i => (f.doc_id + i) % 256).sum
      assert(f.brightness === sum.toDouble / n / 255.0)
    }
    val again = Multimodal.decode(media).collect()
    assert(feats.sortBy(_.doc_id).toSeq === again.sortBy(_.doc_id).toSeq)
  }

  test("resize decodes, nearest-neighbor resamples, re-encodes") {
    implicit val s = spark
    val media = Multimodal.synthesizeBmp(docs)
    val orig = media.collect().map(m => m.doc_id -> Bmp.decode(m.payload)).toMap
    val resized = Multimodal.resize(media, maxSide = 8).collect()
    assert(resized.length === orig.size)
    resized.foreach { r =>
      val m = orig(r.doc_id)
      val img = Bmp.decode(r.payload) // resized payload is itself valid BMP
      assert(math.max(img.width, img.height) <= 8)
      assert(r.n_bytes === r.payload.length)
      if (math.max(m.width, m.height) <= 8) {
        assert((img.width, img.height) === (m.width, m.height))
        assert(img.rgb.toSeq === m.rgb.toSeq) // pass-through untouched
      } else {
        val scale = 8.0 / math.max(m.width, m.height)
        assert(img.width === math.max(1, math.round(m.width * scale).toInt))
        assert(img.height === math.max(1, math.round(m.height * scale).toInt))
        // nearest-neighbor: every output pixel is an exact source pixel
        for (y <- 0 until img.height; x <- 0 until img.width) {
          val sx = (x.toLong * m.width / img.width).toInt
          val sy = (y.toLong * m.height / img.height).toInt
          val d = (y * img.width + x) * 3
          val sp = (sy * m.width + sx) * 3
          assert(img.rgb(d) === m.rgb(sp) && img.rgb(d + 1) === m.rgb(sp + 1)
            && img.rgb(d + 2) === m.rgb(sp + 2))
        }
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
