package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ByteFallbackSpec extends SparkSpec {
  import spark.implicits._

  private def vocab =
    Seq(("the", 0, 5L), ("cat", 1, 3L)).toDF("token", "id", "n")

  test("reserveBytes reserves ids 0-255 and shifts trained ids by 256") {
    val v = Packing.reserveBytes(vocab)
      .as[(String, Int, Long)].collect()
      .map { case (t, i, n) => (t, (i, n)) }.toMap
    assert(v.size == 258)
    assert(v("<0x00>") == (0, 0L))
    assert(v("<0x41>") == (0x41, 0L))
    assert(v("<0xFF>") == (255, 0L))
    assert(v("the") == (256, 5L))
    assert(v("cat") == (257, 3L))
  }

  test("byteFallbackStream passes in-vocab through, decomposes OOV to bytes") {
    val stream = Seq(
      (1L, 0L, "the"), (1L, 1L, "zx"), (1L, 2L, "cat"),
      (2L, 0L, "q")).toDF("doc_id", "pos", "tok")
    val got = Packing.byteFallbackStream(stream, "doc_id", vocab)
      .orderBy(col("doc_id"), col("pos"))
      .as[(Long, Long, String)].collect().toSeq
    // positions renumber densely over the mixed stream; 'z'=0x7A 'x'=0x78
    assert(got == Seq(
      (1L, 0L, "the"), (1L, 1L, "<0x7A>"), (1L, 2L, "<0x78>"),
      (1L, 3L, "cat"),
      (2L, 0L, "<0x71>")))
  }

  test("byteFallbackStream + reserveBytes ids: tape has no negative ids") {
    val stream = Seq(
      (1L, 0L, "the"), (1L, 1L, "zap"), (2L, 0L, "cat"))
      .toDF("doc_id", "pos", "tok")
    val bf = Packing.byteFallbackStream(stream, "doc_id", vocab)
    // the exportShardsOf id assignment: left-join the rebased vocab
    val ids = bf.join(Packing.reserveBytes(vocab)
          .select(col("token").as("tok"), col("id")), Seq("tok"), "left")
      .select(col("doc_id"), col("pos"),
        coalesce(col("id"), lit(-1)).as("tid"))
      .as[(Long, Long, Int)].collect().toSeq.sorted
    assert(ids.forall(_._3 >= 0))
    // 'z','a','p' -> 0x7A,0x61,0x70 as raw byte ids; trained +256
    assert(ids == Seq(
      (1L, 0L, 256), (1L, 1L, 0x7A), (1L, 2L, 0x61), (1L, 3L, 0x70),
      (2L, 0L, 257)).sorted)
  }

  test("non-ASCII codepoints take <U+...> names that MISS the " +
      "reserved 256 and encode -1 loudly, never alias") {
    // U+00E9 (é, 0xE9 > 127) must NOT become the valid piece <0xE9>;
    // U+0100 (Ā) once lpad-TRUNCATED its 3-digit hex onto <0x10>
    val stream = Seq(
      (1L, 0L, "the"), (1L, 1L, "zé"), (1L, 2L, "Āb"))
      .toDF("doc_id", "pos", "tok")
    val bf = Packing.byteFallbackStream(stream, "doc_id", vocab)
      .orderBy(col("pos")).as[(Long, Long, String)].collect().toSeq
    assert(bf == Seq(
      (1L, 0L, "the"), (1L, 1L, "<0x7A>"), (1L, 2L, "<U+E9>"),
      (1L, 3L, "<U+100>"), (1L, 4L, "<0x62>")))
    val ids = Seq((1L, 0L, "the"), (1L, 1L, "zé"))
      .toDF("doc_id", "pos", "tok")
    val tids = Packing.byteFallbackStream(ids, "doc_id", vocab)
      .join(Packing.reserveBytes(vocab)
        .select(col("token").as("tok"), col("id")), Seq("tok"), "left")
      .select(coalesce(col("id"), lit(-1)).as("tid"))
      .as[Int].collect().toSeq.sorted
    // the é piece reads -1 (loud) instead of silently aliasing 0xE9
    assert(tids == Seq(-1, 0x7A, 256).sorted)
  }
}
