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

  /** Row count of `documents`, cached per data directory: several
    * fixture generators need the corpus size at PLAN-BUILD time (hash
    * targets modulo n) — without the cache each invocation ran a
    * hidden count job before its query even started. The testdata is
    * immutable per dir, so a process-lifetime cache is sound.
    */
  private val docCountCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  def docCount(spark: SparkSession, dir: String): Long =
    docCountCache.computeIfAbsent(dir,
      d => apply(spark, d, "documents").count()).longValue()

  private def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` arrives as parquet TIMESTAMP(NANOS) in some testdata
    * generations (Spark's µs TimestampType refuses it — read as a raw
    * nanosecond long via the legacy conf) and TIMESTAMP(MICROS) in
    * others. Both layouts expose the same contract: `ts_ns` (nanosecond
    * ticks), `ts_us` (microsecond ticks — use THIS for anything compared
    * against the DuckDB oracle, which reads either layout at µs), and a
    * TimestampType `ts` for window/date logic.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val raw = read(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => // TIMESTAMP(NANOS) read as nanosecond longs
        raw.withColumnRenamed("ts", "ts_ns")
          // integer division: ts_ns exceeds double's 2^53 mantissa, so a
          // float path would corrupt low digits
          .withColumn("ts_us", expr("ts_ns div 1000"))
          .withColumn("ts", timestamp_micros(col("ts_us")))
      case _ => // TIMESTAMP(MICROS); NTZ casts losslessly under the
        // pinned-UTC session timezone
        raw.withColumn("ts", col("ts").cast(TimestampType))
          .withColumn("ts_us", unix_micros(col("ts")))
          // a MICROS file can hold timestamps past year 2262 whose
          // nanosecond tick overflows int64 (a NANOS file cannot) —
          // fail loudly instead of wrapping
          .withColumn("ts_ns",
            when(abs(col("ts_us")) <= lit(Long.MaxValue / 1000L),
              col("ts_us") * lit(1000L))
              .otherwise(raise_error(concat(
                lit("events.ts beyond year-2262 nanosecond range: ts_us="),
                col("ts_us").cast("string"))).cast(LongType)))
    }
  }
}
