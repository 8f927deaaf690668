package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // extra args = substring filters for fast local iteration on a
    // query subset (the driver always passes exactly two args)
    val only = args.drop(2)
    def selected(name: String): Boolean =
      only.isEmpty || only.exists(name.contains)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      if (selected(name)) {
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // DuckDB inlines a CTE at every reference site: a chain where one
    // relation feeds four consumers replays its whole upstream pipeline
    // 4x (q144's oracle: 322 s raw, 0.3 s with every CTE MATERIALIZED
    // at sf0.01 — measured round 10). MATERIALIZED is a semantics-
    // neutral hint, so it is applied centrally at dump time: every
    // composed oracle, current and future, ships bounded SQL to the
    // driver. The pattern only rewrites CTE definitions — WINDOW
    // clauses ("WINDOW w AS (") have a non-matching line prefix and
    // recursive members ("reach(node, lab) AS (") carry a column list.
    def materializeCtes(sql: String): String =
      """(?m)(^|\bWITH\s+(?:RECURSIVE\s+)?)([A-Za-z_][A-Za-z0-9_]*) AS \(""".r
        .replaceAllIn(sql, m => java.util.regex.Matcher.quoteReplacement(
          m.group(1) + m.group(2) + " AS MATERIALIZED ("))
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => selected(k) }
      .map { case (k, v) => s"${q(k)}: ${q(materializeCtes(v))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
