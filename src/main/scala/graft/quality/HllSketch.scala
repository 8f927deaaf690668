package graft.quality

import graft.functions.PortableHash
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HyperLogLog registers with exact-integer arithmetic — the
  * fixed-size distinct-count sketch completing the mergeable trio
  * ([[HistSketch]] quantiles, [[CmsSketch]] frequencies): 256
  * registers, merge = per-register MAX, so per-shard register sets
  * persist once and roll up to any union without rescanning.
  * [[graft.functions.KmvSketch]] (k minimum values) stays the
  * oracle-exact estimator; HLL is the constant-size one — 256 rows
  * regardless of k or cardinality.
  *
  * Register math on the portable 60-bit hash: the top 8 bits select
  * the register (`h div 2^52`), and rho is the leading-zero count of
  * the remaining 52-bit tail plus one (`53 - bitlen(tail)`,
  * `bitlen` via `length(bin(x))` — the q198 cross-engine idiom;
  * all-zero tail saturates at 53). The harmonic sum is exact:
  * `S = Σ_regs 2^(53 - M_j)` (empty register ⇒ `2^53`), and the
  * estimate `alpha·m²/Σ2^-M` is carried as
  * `(((m·2^53) div S)·m·71827) div 100000` — truncating div both
  * engines, exact below ~10^14 distinct (far past any real corpus;
  * the alpha constant is 0.7213/(1+1.079/m) at m=256 in ppm·10).
  */
object HllSketch {

  val M = 256
  private val Pow53 = 1L << 53

  /** Occupied registers `(reg, max_rho)` for the distinct values of
    * `itemCol` (registers no item hashes into are absent — merge with
    * [[complete]] before estimating).
    */
  def registers(items: DataFrame, itemCol: String): DataFrame =
    items
      .select(PortableHash.hash60Base(col(itemCol)).as("__h"))
      .select(expr("__h div 4503599627370496").as("reg"), // 2^52
        expr("__h % 4503599627370496").as("__tail"))
      .select(col("reg"),
        when(col("__tail") === 0L, lit(53L))
          .otherwise(lit(53L) - length(bin(col("__tail"))))
          .as("rho"))
      .groupBy(col("reg"))
      .agg(max(col("rho")).as("max_rho"))

  /** Merge register relations (per-register MAX — merged shards == a
    * direct build, the sketch-merge contract).
    */
  def merge(parts: DataFrame*): DataFrame =
    parts.reduce(_ unionByName _)
      .groupBy(col("reg"))
      .agg(max(col("max_rho")).as("max_rho"))

  /** All M registers (absent ⇒ 0) with the exact-integer estimate and
    * harmonic sum attached as constant columns:
    * `(reg, max_rho, s_sum, est)`.
    */
  def complete(regs: DataFrame): DataFrame = {
    val spark = regs.sparkSession
    val all = spark.range(M).select(col("id").as("reg"))
    val full = all.join(regs, Seq("reg"), "left")
      .select(col("reg"),
        coalesce(col("max_rho"), lit(0L)).as("max_rho"))
    val summary = full
      .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - max_rho AS INT))"))
        .cast("long").as("s_sum"))
      .select(col("s_sum"),
        expr(s"((($M * $Pow53) div s_sum) * $M * 71827) div 100000")
          .as("est"))
    full.crossJoin(broadcast(summary))
  }

  /** Oracle CTEs over `itemsRel(item)`: `hllfull<sfx>(reg, max_rho)`
    * (all M rows) and `hllsum<sfx>(s_sum, est)`.
    */
  def ctes(itemsRel: String, sfx: String = ""): String =
    s"""hllh$sfx AS (SELECT ${PortableHash.hash60BaseSql("item")} AS h FROM $itemsRel),
       |hllr$sfx AS (SELECT h // 4503599627370496 AS reg,
       |    CASE WHEN h % 4503599627370496 = 0 THEN CAST(53 AS BIGINT) ELSE CAST(53 - length(bin(h % 4503599627370496)) AS BIGINT) END AS rho
       |  FROM hllh$sfx),
       |hllm$sfx AS (SELECT reg, MAX(rho) AS max_rho FROM hllr$sfx GROUP BY reg),
       |hllfull$sfx AS (SELECT g.reg, coalesce(m.max_rho, CAST(0 AS BIGINT)) AS max_rho
       |  FROM (SELECT unnest(generate_series(0, ${M - 1})) AS reg) g
       |  LEFT JOIN hllm$sfx m ON m.reg = g.reg),
       |hllsum$sfx AS (SELECT s_sum, ((($M * $Pow53) // s_sum) * $M * 71827) // 100000 AS est FROM (
       |  SELECT CAST(SUM(CAST(1 AS BIGINT) << CAST(53 - max_rho AS INT)) AS BIGINT) AS s_sum FROM hllfull$sfx) t)""".stripMargin
}
