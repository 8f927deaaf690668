package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** File-format surface beyond the canonical Parquet: CSV, JSON-lines and
  * ORC readers/writers with engine defaults pinned for round-trip
  * fidelity (SURVEY.md §2.2 "sources/sinks/file formats").
  *
  * Scale notes baked into the defaults:
  *  - reads take an explicit [[StructType]] — schema inference re-scans
  *    the data (2x I/O at 100 TB) and can silently widen types between
  *    runs; an explicit schema also keeps column pruning exact for
  *    formats without footers (CSV/JSON read only what the parser needs
  *    when the schema names it).
  *  - timestamps serialize as ISO-8601 with microsecond precision in
  *    UTC, so CSV/JSON round-trips are lossless for TimestampType.
  *  - CSV quoting handles embedded delimiters; values containing raw
  *    NEWLINES are written quoted and need `readCsv(..., multiLine =
  *    true)` to parse back — multiLine is OFF by default because it
  *    forces single-split-per-file parsing (no intra-file parallelism
  *    at 100 TB). Data with embedded newlines belongs in parquet/ORC.
  */
object Formats {

  private val TsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  def writeCsv(df: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .option("header", "true")
      .option("timestampFormat", TsFmt)
      // the WRITER defaults these to true and silently strips value
      // whitespace — lossy round-trip
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType,
      multiLine: Boolean = false): DataFrame =
    spark.read
      .option("header", "true")
      .option("timestampFormat", TsFmt)
      .option("multiLine", multiLine.toString)
      .schema(schema)
      .csv(path)

  def writeJson(df: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .option("timestampFormat", TsFmt)
      .json(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("timestampFormat", TsFmt)
      .schema(schema)
      .json(path)

  def writeOrc(df: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Whole-file binary ingestion — the multimodal on-ramp: each matched
    * file becomes one row `(path, modificationTime, length, content
    * BINARY)`, ready for the `Multimodal` byte-level operators. Push a
    * size cap via `spark.sql.binaryFile.maxLength` rather than filtering
    * post-read (the source skips oversized files at listing time); at
    * 100 TB prefer many medium files over few huge ones — one file is
    * one task (the format is NOT splittable by design).
    */
  def readBinaryFiles(spark: SparkSession, path: String,
      glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)

  /** Line-oriented text read: one row per line (`value` STRING), the raw
    * corpus on-ramp (splittable, parallel within files).
    */
  def readTextLines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  def writeTextLines(df: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).text(path)
}
