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

  test("non-ASCII codepoints decompose into their UTF-8 bytes — the " +
      "SentencePiece contract, 2/3/4-byte sequences all in range") {
    // é U+00E9 → C3 A9; Ā U+0100 (the old lpad-truncation hazard)
    // → C4 80; € U+20AC → E2 82 AC; 𝄞 U+1D11E (supplementary,
    // surrogate pair in UTF-16) → F0 9D 84 9E
    val stream = Seq(
      (1L, 0L, "the"), (1L, 1L, "zé"), (1L, 2L, "Āb"),
      (2L, 0L, "€"), (3L, 0L, "𝄞"))
      .toDF("doc_id", "pos", "tok")
    val bf = Packing.byteFallbackStream(stream, "doc_id", vocab)
      .orderBy(col("doc_id"), col("pos"))
      .as[(Long, Long, String)].collect().toSeq
    assert(bf == Seq(
      (1L, 0L, "the"), (1L, 1L, "<0x7A>"), (1L, 2L, "<0xC3>"),
      (1L, 3L, "<0xA9>"), (1L, 4L, "<0xC4>"), (1L, 5L, "<0x80>"),
      (1L, 6L, "<0x62>"),
      (2L, 0L, "<0xE2>"), (2L, 1L, "<0x82>"), (2L, 2L, "<0xAC>"),
      (3L, 0L, "<0xF0>"), (3L, 1L, "<0x9D>"), (3L, 2L, "<0x84>"),
      (3L, 3L, "<0x9E>")))
    // every piece hits the reserved 256 — the tape can never read -1
    val tids = Packing.byteFallbackStream(stream, "doc_id", vocab)
      .join(Packing.reserveBytes(vocab)
        .select(col("token").as("tok"), col("id")), Seq("tok"), "left")
      .select(coalesce(col("id"), lit(-1)).as("tid"))
      .as[Int].collect().toSeq
    assert(tids.forall(_ >= 0))
  }

  test("the tape decodes back BYTE-EXACT: byte pieces reassemble the " +
      "original token stream's UTF-8 text") {
    val toks = Seq("the", "café", "€42", "cat",
      "𝄞-clef")
    val stream = toks.zipWithIndex
      .map { case (t, i) => (1L, i.toLong, t) }
      .toDF("doc_id", "pos", "tok")
    val pieces = Packing.byteFallbackStream(stream, "doc_id", vocab)
      .orderBy(col("pos")).as[(Long, Long, String)].collect().toSeq
    // decode: in-vocab pieces contribute their UTF-8 bytes, <0xNN>
    // pieces contribute the raw byte — the loader's contract
    val bytes = pieces.flatMap { case (_, _, p) =>
      if (p.startsWith("<0x"))
        Seq(Integer.parseInt(p.substring(3, 5), 16).toByte)
      else p.getBytes(java.nio.charset.StandardCharsets.UTF_8).toSeq
    }.toArray
    val decoded = new String(bytes,
      java.nio.charset.StandardCharsets.UTF_8)
    assert(decoded == toks.mkString(""))
  }
}
