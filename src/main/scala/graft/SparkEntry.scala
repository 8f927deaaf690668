package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query groups live in `graft.queries.*`; each group pairs DataFrame
  * implementations with the ANSI SQL the DuckDB oracle replays.
  */
object SparkEntry {

  /** Scale-ADAPTIVE shuffle sizing (optimization guide §2.2): let AQE
    * coalesce post-shuffle partitions to the advisory byte target
    * instead of pinning them to the core count.
    * `parallelismFirst=false` is Spark's own documented production
    * posture — with the default `true`, AQE refuses to coalesce below
    * `defaultParallelism`, so a kilobyte-sized aggregate still pays
    * 32-task scheduling per stage at local scale while a 100 TB
    * shuffle still gets `advisory`-sized (64 MB) partitions, i.e. the
    * SAME setting right-sizes both ends — nothing here is tuned to
    * `local[32]`. Both knobs stay env-overridable so the driver's
    * bench contract (`SPARK_GRAFT_CPUS` initial partitions) is intact:
    * `spark.sql.shuffle.partitions` remains the cpu count, AQE only
    * merges what the runtime sizes prove small.
    */
  def tune(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
      sys.env.getOrElse("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "false"))
    .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
      sys.env.getOrElse("SPARK_GRAFT_ADVISORY_PARTITION", "64m"))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The flagship is the SCD Type-1/Type-2 merge — the reference's whole
    * reason to exist (reference `SCD_script.txt`).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q13_scd_merge")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreQueries.queries ++
      graft.queries.ScdQueries.queries ++
      graft.queries.PipelineQueries.queries ++
      graft.queries.VectorQueries.queries ++
      graft.queries.ExtendedQueries.queries ++
      graft.queries.Round3Queries.queries ++
      graft.queries.Round3bQueries.queries ++
      graft.queries.Round5Queries.queries ++
      graft.queries.Round6Queries.queries ++
      graft.queries.Round7Queries.queries ++
      graft.queries.Round7bQueries.queries ++
      graft.queries.Round7cQueries.queries ++
      graft.queries.Round8Queries.queries ++
      graft.queries.Round9Queries.queries ++
      graft.queries.Round9bQueries.queries ++
      graft.queries.Round9cQueries.queries ++
      graft.queries.Round10Queries.queries ++
      graft.queries.Round10bQueries.queries ++
      graft.queries.Round11Queries.queries ++
      graft.queries.Round11bQueries.queries ++
      graft.queries.Round13Queries.queries ++
      graft.queries.Round13bQueries.queries ++
      graft.queries.Round14Queries.queries ++
      graft.queries.Round15Queries.queries ++
      graft.queries.Round15bQueries.queries ++
      graft.queries.Round16Queries.queries ++
      graft.queries.Round17Queries.queries ++
      graft.queries.Round18Queries.queries ++
      graft.queries.Round19Queries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.oracleSql ++
      graft.queries.ScdQueries.oracleSql ++
      graft.queries.PipelineQueries.oracleSql ++
      graft.queries.VectorQueries.oracleSql ++
      graft.queries.ExtendedQueries.oracleSql ++
      graft.queries.Round3Queries.oracleSql ++
      graft.queries.Round3bQueries.oracleSql ++
      graft.queries.Round5Queries.oracleSql ++
      graft.queries.Round6Queries.oracleSql ++
      graft.queries.Round7Queries.oracleSql ++
      graft.queries.Round7bQueries.oracleSql ++
      graft.queries.Round7cQueries.oracleSql ++
      graft.queries.Round8Queries.oracleSql ++
      graft.queries.Round9Queries.oracleSql ++
      graft.queries.Round9bQueries.oracleSql ++
      graft.queries.Round9cQueries.oracleSql ++
      graft.queries.Round10Queries.oracleSql ++
      graft.queries.Round10bQueries.oracleSql ++
      graft.queries.Round11Queries.oracleSql ++
      graft.queries.Round11bQueries.oracleSql ++
      graft.queries.Round13Queries.oracleSql ++
      graft.queries.Round13bQueries.oracleSql ++
      graft.queries.Round14Queries.oracleSql ++
      graft.queries.Round15Queries.oracleSql ++
      graft.queries.Round15bQueries.oracleSql ++
      graft.queries.Round16Queries.oracleSql ++
      graft.queries.Round17Queries.oracleSql ++
      graft.queries.Round18Queries.oracleSql ++
      graft.queries.Round19Queries.oracleSql
}
