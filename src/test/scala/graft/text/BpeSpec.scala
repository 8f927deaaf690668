package graft.text

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** BPE training vs an independent plain-Scala greedy-BPE reference
  * (explicit left-to-right scan, no string-replace trick), plus the
  * adjacency edge cases the replace encoding must get right.
  */
class BpeSpec extends SparkSpec {

  // ---- plain-Scala reference: greedy scan, count-desc/pair-asc argmax
  private def refSegment(syms: Vector[String],
      pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += (pair._1 + pair._2); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private def refTrain(words: Map[String, Long],
      k: Int): Seq[(Int, String, String, Long)] = {
    var dict: Map[Vector[String], Long] = words.toSeq
      .map { case (w, f) => w.split("").toVector -> f }
      .groupMapReduce(_._1)(_._2)(_ + _)
    val out = Seq.newBuilder[(Int, String, String, Long)]
    for (i <- 1 to k) {
      val counts = dict.toSeq.flatMap { case (syms, f) =>
        syms.zip(syms.tail).map(p => p -> f)
      }.groupMapReduce(_._1)(_._2)(_ + _)
      if (counts.nonEmpty) {
        val ((l, r), c) = counts.toSeq
          .minBy { case ((l, r), c) => (-c, l, r) }
        out += ((i, l, r, c))
        dict = dict.toSeq
          .map { case (syms, f) => refSegment(syms, (l, r)) -> f }
          .groupMapReduce(_._1)(_._2)(_ + _)
      }
    }
    out.result()
  }

  private def docs = Tables(spark, "/root/testdata/sf0.001", "documents")

  test("trained merges equal the plain-Scala greedy reference") {
    val words = docs
      .select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .collect().map(_.getString(0))
      .groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    val want = refTrain(words, 12)
    val got = Bpe.trainMerges(docs, "text", 12)
      .map(m => (m.rank, m.lhs, m.rhs, m.count))
    assert(got == want)
  }

  test("replace encoding is greedy left-to-right (adjacency cases)") {
    val spark0 = spark
    import spark0.implicits._
    val merges = Seq(Bpe.Merge(1, "a", "a", 0L))
    def seg(w: String): Seq[String] = Seq(w).toDF("w")
      .select(Bpe.segment(col("w"), merges).as("s"))
      .collect()(0).getSeq[String](0)
    assert(seg("aaaa") == Seq("aa", "aa")) // adjacent matches both fire
    assert(seg("aaa") == Seq("aa", "a"))   // leftover tail stays atomic
    assert(seg("aab") == Seq("aa", "b"))
    assert(seg("baa") == Seq("b", "aa"))
    // a merged symbol never cascades within its own round
    val m2 = Seq(Bpe.Merge(1, "a", "b", 0L))
    def seg2(w: String): Seq[String] = Seq(w).toDF("w")
      .select(Bpe.segment(col("w"), m2).as("s"))
      .collect()(0).getSeq[String](0)
    assert(seg2("aab") == Seq("a", "ab"))  // greedy picks the LAST a here
    assert(seg2("abab") == Seq("ab", "ab"))
  }

  test("rank-ordered apply chain reproduces the training segmentation") {
    val merges = Bpe.trainMerges(docs, "text", 8)
    // re-derive the dict symbols through segment() (the apply path)
    // and through the trained dict replay in plain Scala: same vocab
    val applied = docs
      .select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .select(explode(Bpe.segment(col("w"), merges)).as("t"))
      .groupBy("t").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val words = docs
      .select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .collect().map(_.getString(0))
    var segs = words.map(_.split("").toVector)
    merges.sortBy(_.rank).foreach { m =>
      segs = segs.map(refSegment(_, (m.lhs, m.rhs)))
    }
    val want = segs.flatten.groupBy(identity)
      .map { case (t, xs) => t -> xs.length.toLong }
    assert(applied == want)
  }

  test("train is deterministic across runs and layouts") {
    val a = Bpe.trainMerges(docs, "text", 6)
    val b = Bpe.trainMerges(docs.repartition(13), "text", 6)
    assert(a == b)
  }

  test("symbolStream: contiguous positions, document order, word-exact") {
    import spark.implicits._
    val d = Seq((1L, "alpha beta alpha"), (2L, "gamma"), (3L, ""))
      .toDF("doc_id", "text")
    val merges = Bpe.trainMerges(d, "text", 6)
    val rows = Bpe.symbolStream(d, "doc_id", "text", merges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byDoc = rows.groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(x => (x._2, x._3)).toSeq).toMap
    // positions contiguous from 0
    byDoc.values.foreach(seq =>
      assert(seq.map(_._1) == (0L until seq.length).toSeq))
    // concatenated symbols reproduce the words in order
    def rejoin(seq: Seq[(Long, String)], words: Seq[String]): Unit = {
      var rest = seq.map(_._2)
      words.foreach { w =>
        var acc = ""
        while (acc != w) { acc += rest.head; rest = rest.tail }
      }
      assert(rest.isEmpty)
    }
    rejoin(byDoc(1L), Seq("alpha", "beta", "alpha"))
    rejoin(byDoc(2L), Seq("gamma"))
    assert(!byDoc.contains(3L)) // empty doc emits no stream rows
  }

  test("fertility report matches plain-Scala per-word arithmetic") {
    val merges = Bpe.trainMerges(docs, "text", 6)
    val segCache = scala.collection.mutable.Map.empty[String, Long]
    def nSym(word: String): Long = segCache.getOrElseUpdate(word, {
      var syms = word.split("").toVector
      merges.sortBy(_.rank).foreach(m =>
        syms = refSegment(syms, (m.lhs, m.rhs)))
      syms.length.toLong
    })
    val rows = docs.select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expect = rows.groupBy(_._1).map { case (src, rs) =>
      val words = rs.toSeq.flatMap(
        _._2.trim.split("\\s+").toSeq.filter(_.nonEmpty))
      src -> ((rs.length.toLong, words.length.toLong,
        words.map(nSym).sum, words.map(_.length.toLong).sum))
    }
    val rep = Bpe.fertilityReport(docs.select(col("source"), col("text")),
        "source", "text", merges).collect()
    val got = rep.map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expect)
    rep.foreach { r =>
      assert(r.getDouble(5) == r.getLong(3).toDouble / r.getLong(2).toDouble)
      assert(r.getDouble(6) == r.getLong(4).toDouble / r.getLong(3).toDouble)
    }
  }
}
