package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** File-source streaming: readStream over a landing directory picks up
  * files incrementally (each file exactly once), the batch shape any
  * 100 TB drop-zone ingestion starts from.
  */
class StreamingFileSourceSpec extends SparkSpec {

  test("landing-directory parquet stream ingests files incrementally") {
    import spark.implicits._
    val landing = Files.createTempDirectory("graft-landing").toString
    val schema = Seq((1L, "x")).toDF("id", "v").schema

    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("append").parquet(landing)

    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(landing)
      .groupBy(col("v")).agg(count(lit(1)).as("n"))
    val q = stream.writeStream
      .outputMode(OutputMode.Complete())
      .format("memory").queryName("landing_agg")
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("landing_agg").as[(String, Long)].collect().toMap
        === Map("a" -> 1L, "b" -> 1L))

      // a late-arriving file is picked up on the next trigger, and
      // already-seen files are NOT re-read
      Seq((3L, "a"), (4L, "c")).toDF("id", "v")
        .write.mode("append").parquet(landing)
      q.processAllAvailable()
      assert(spark.table("landing_agg").as[(String, Long)].collect().toMap
        === Map("a" -> 2L, "b" -> 1L, "c" -> 1L))
    } finally q.stop()
  }
}
