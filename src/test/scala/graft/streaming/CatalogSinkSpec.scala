package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.catalog.ParquetCatalog
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Exactly-once streaming ingestion into the versioned catalog. */
class CatalogSinkSpec extends SparkSpec {

  test("stream appends land once; replayed batch ids are skipped; compaction keeps the marker") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val cat = new ParquetCatalog(spark,
      Files.createTempDirectory("graft-sink-cat").toString)
    cat.create("ev", Seq((1L, "x")).toDF("id", "v").schema)
    val sink = new CatalogSink(cat, "ev", compactEvery = 2)

    val src = MemoryStream[(Long, String)]
    val q = src.toDF().toDF("id", "v").writeStream
      .foreachBatch(sink)
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sink-ck").toString)
      .start()
    try {
      src.addData((1L, "a"))
      q.processAllAvailable()
      src.addData((2L, "b"), (3L, "c"))
      q.processAllAvailable()
      assert(cat.table("ev").count() === 3)
      assert(sink.lastCommitted() >= 1L)

      // simulate the at-least-once crash replay: re-deliver batch 0
      val replay = Seq((1L, "a")).toDF("id", "v")
      sink(replay, 0L)
      assert(cat.table("ev").count() === 3, "replayed batch must be skipped")

      // a genuinely new batch id still lands, and compaction (triggered
      // on odd ids by compactEvery=2) preserved the committed marker
      sink(Seq((4L, "d")).toDF("id", "v"), sink.lastCommitted() + 1)
      assert(cat.table("ev").count() === 4)
      assert(cat.table("ev").as[(Long, String)].collect().toSet ===
        Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
    } finally q.stop()
  }
}
