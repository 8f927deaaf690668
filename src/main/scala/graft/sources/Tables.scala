package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Canonical access to the driver-generated Parquet testdata
  * (`/root/testdata/sf*`; see repo TESTDATA.md). Plain parquet scans so
  * Catalyst predicate pushdown / column pruning reach the file source.
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir) else read(spark, dir, name)

  private def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's TimestampType
    * (microseconds) refuses outright. Read it as a raw nanosecond long
    * (legacy conf) and expose `ts_ns` (full precision), `ts_us`
    * (microsecond ticks — use THIS for anything compared against the
    * DuckDB oracle, which truncates parquet ns timestamps to µs on
    * read), and a truncated TimestampType `ts` for window/date logic.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    read(spark, dir, "events")
      .withColumnRenamed("ts", "ts_ns")
      // integer division: ts_ns exceeds double's 2^53 mantissa, so a
      // float path would corrupt low digits
      .withColumn("ts_us", expr("ts_ns div 1000"))
      .withColumn("ts", timestamp_micros(col("ts_us")))
  }
}
