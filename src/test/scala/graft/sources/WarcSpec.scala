package graft.sources

import graft.SparkSpec
import java.nio.charset.StandardCharsets.UTF_8

class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def rec(uri: String, body: String) = (uri, body.getBytes(UTF_8))

  test("segment roundtrip preserves records, order, and bytes") {
    val recs = Seq(
      rec("http://a.com/1", "hello <b>world</b>"),
      rec("http://a.com/2", ""), // empty payload is legal
      rec("http://b.com/x", "line1\r\nline2")) // CRLF inside payload
    val bytes = Warc.writeSegment(recs.iterator)
    val back = Warc.parseSegment(bytes)
    assert(back.map(_._1) == recs.map(_._1))
    assert(back.map(r => new String(r._2, UTF_8)) ==
      recs.map(r => new String(r._2, UTF_8)))
  }

  test("malformed segments fail loudly, never plausibly") {
    val good = Warc.writeSegment(Iterator(rec("http://a/1", "abc")))
    def bad(b: Array[Byte]) =
      intercept[IllegalArgumentException](Warc.parseSegment(b))
    // truncated payload
    assert(bad(good.dropRight(5)).getMessage.contains("WARC parse"))
    // wrong magic
    val wrong = ("HTTP/1.0\r\n" + new String(good, UTF_8).drop(10))
      .getBytes(UTF_8)
    assert(bad(wrong).getMessage.contains("expected WARC/1.0"))
    // missing Content-Length
    val noLen = "WARC/1.0\r\nWARC-Target-URI: u\r\n\r\nxx\r\n\r\n"
      .getBytes(UTF_8)
    assert(bad(noLen).getMessage.contains("Content-Length"))
  }

  test("write/read through files recovers the full relation") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-warc-spec").toString
    val df = (1L to 37L)
      .map(i => (s"http://d${i % 3}.example.com/p/$i", s"body $i <p>x</p>"))
      .toDF("uri", "html")
    Warc.writeSegments(df.repartition(4), "uri", "html", dir)
    val back = Warc.readRecords(spark, dir)
      .as[(String, String)].collect().toSet
    assert(back == (1L to 37L)
      .map(i => (s"http://d${i % 3}.example.com/p/$i", s"body $i <p>x</p>"))
      .toSet)
    graft.queries.Round7bQueries.rmTree(dir)
  }

  test("segment names are deterministic; re-landing never duplicates") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-warc-retry").toString
    val df = (1L to 20L).map(i => (s"http://h/p/$i", s"b$i"))
      .toDF("uri", "html").repartition(3)
    // a retried/speculative attempt re-lands its partition: same
    // partition-id name, atomic replace — never a second copy
    Warc.writeSegments(df, "uri", "html", dir)
    Warc.writeSegments(df, "uri", "html", dir)
    val files = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
    val names = try {
      import scala.jdk.CollectionConverters._
      files.iterator().asScala.map(_.getFileName.toString).toList.sorted
    } finally files.close()
    assert(names.forall(_.matches("segment-\\d{5}\\.warc")))
    assert(names.size <= 3) // one per non-empty partition, no UUID dups
    assert(Warc.readRecords(spark, dir).count() == 20L)
    graft.queries.Round7bQueries.rmTree(dir)
  }
}
