package graft.scd

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Golden test: the reference's own worked example (reference
  * `README.md:54-57` seed, `README.md:84-88` staging, expected final table
  * `README.md:306-320`) asserted modulo the two documented divergences:
  * deterministic surrogate keys and gapless validity intervals
  * (SURVEY.md §2.3(4)(5)).
  */
class ScdMergeSpec extends SparkSpec {
  import ScdMergeSpec._

  lazy val production: DataFrame = spark.createDataFrame(
    java.util.Arrays.asList(
      Row(1, "user1", true, "address1", "123456789", "John", "Doe", 1980, 1,
        ts("2024-04-01 00:00:00"), high, true),
      Row(2, "user2", false, "address2", null, "Alice", "Smith", 1990, 1,
        ts("2024-04-01 00:00:00"), high, true)
    ),
    prodSchema)

  lazy val staging: DataFrame = spark.createDataFrame(
    java.util.Arrays.asList(
      Row("user1", "John", "Doe", 1985, true, "address1", "987654321"),
      Row("user2", "Alice", "Smith", 1990, true, "address2", null),
      Row("user3", "Emma", "Johnson", 1985, true, "address3", "987654321")
    ),
    stagSchema)

  test("golden: reference worked example, stable keys") {
    val out = ScdMerge.merge(production, staging, dimUser, MergeOptions(asOf))
    val got = out.collect().map(_.toSeq).toSet
    val want = Set(
      // user1 v1 closed (phone changed), Type-1 year refreshed 1980->1985
      Seq(1, "user1", true, "address1", "123456789", "John", "Doe", 1985, 1,
        ts("2024-04-01 00:00:00"), asOf, false),
      // user1 v2 reopened
      Seq(3, "user1", true, "address1", "987654321", "John", "Doe", 1985, 2,
        asOf, high, true),
      // user2 v1 closed (premium false->true)
      Seq(2, "user2", false, "address2", null, "Alice", "Smith", 1990, 1,
        ts("2024-04-01 00:00:00"), asOf, false),
      // user2 v2 reopened
      Seq(4, "user2", true, "address2", null, "Alice", "Smith", 1990, 2,
        asOf, high, true),
      // user3 brand new
      Seq(5, "user3", true, "address3", "987654321", "Emma", "Johnson", 1985,
        1, asOf, high, true)
    )
    assert(got === want)
  }

  test("golden: hiveCompat renumbers all surrogate keys by start date") {
    val out = ScdMerge.merge(production, staging, dimUser,
      MergeOptions(asOf, keyMode = KeyMode.HiveCompat, nullSafeCompare = false,
        coalesceCompareCols = Set("phone")))
    val got = out.collect()
      .map(r => (r.getString(1), r.getInt(8), r.getInt(0))).toSet
    // order by (scd_start_date, login, version): the two 2024-04-01 rows
    // first (user1 v1 -> 1, user2 v1 -> 2), then the three asOf rows
    // (user1 v2 -> 3, user2 v2 -> 4, user3 v1 -> 5).
    assert(got === Set(("user1", 1, 1), ("user2", 1, 2), ("user1", 2, 3),
      ("user2", 2, 4), ("user3", 1, 5)))
  }

  test("idempotence: merging an unchanged snapshot is a no-op") {
    val once = ScdMerge.merge(production, staging, dimUser, MergeOptions(asOf))
    val stagingAgain = staging
    val twice = ScdMerge.merge(once, stagingAgain, dimUser,
      MergeOptions(ts("2024-06-01 00:00:00")))
    assert(twice.collect().map(_.toSeq).toSet ===
      once.collect().map(_.toSeq).toSet)
  }

  test("null black-hole: compat mode drops the row, nullSafe keeps it") {
    val prodNull = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1, "user1", true, null, "123456789", "John", "Doe", 1980, 1,
          ts("2024-04-01 00:00:00"), high, true)),
      prodSchema)
    val stagNull = spark.createDataFrame(
      java.util.Arrays.asList(
        Row("user1", "John", "Doe", 1980, true, null, "123456789")),
      stagSchema)
    // address NULL on both sides, all other T2 equal -> unchanged member.
    // Reference predicate (no COALESCE on address): NULL != NULL is NULL,
    // NULL = NULL is NULL -> row matches NO branch and vanishes
    // (SURVEY.md §2.3(3)). nullSafe mode keeps it as B3.
    val compat = ScdMerge.merge(prodNull, stagNull, dimUser,
      MergeOptions(asOf, nullSafeCompare = false,
        coalesceCompareCols = Set("phone")))
    assert(compat.count() === 0)
    val fixed = ScdMerge.merge(prodNull, stagNull, dimUser, MergeOptions(asOf))
    assert(fixed.count() === 1)
    assert(fixed.head.getBoolean(11) === true) // still active, not versioned
  }

  test("closeMissing: no active row survives for a vanished key") {
    // user2 disappears from the full snapshot
    val partial = staging.filter(org.apache.spark.sql.functions
      .col("login") =!= "user2")
    val closed = ScdMerge.merge(production, partial, dimUser,
      MergeOptions(asOf, closeMissing = true))
    val u2 = closed.filter(org.apache.spark.sql.functions
      .col("login") === "user2").collect()
    assert(u2.length === 1)
    assert(!u2.head.getAs[Boolean]("scd_active"))
    assert(u2.head.getAs[Timestamp]("scd_end_date") === asOf)
    // property over every key: active rows exist only for staged keys
    val activeKeys = closed
      .filter(org.apache.spark.sql.functions.col("scd_active"))
      .select("login").collect().map(_.getString(0)).toSet
    val stagedKeys = partial.select("login").collect()
      .map(_.getString(0)).toSet
    assert(activeKeys.subsetOf(stagedKeys))
    // default mode: the vanished key's row is carried verbatim, still open
    val carried = ScdMerge.merge(production, partial, dimUser,
      MergeOptions(asOf))
      .filter(org.apache.spark.sql.functions.col("login") === "user2")
      .collect()
    assert(carried.length === 1 && carried.head.getAs[Boolean]("scd_active"))
  }

  test("staging dedupe keeps latest by order column") {
    import spark.implicits._
    val dup = Seq(
      ("user1", "John", "Doe", 1985, true, "a1", "1", 1),
      ("user1", "John", "Doe", 1985, true, "a2", "2", 2)
    ).toDF("login", "name", "surname", "year_of_birth", "premium_user",
      "address", "phone", "seq")
    val out = ScdMerge.dedupeStagingLatest(dup, dimUser, "seq")
    assert(out.collect().map(_.getString(5)).toSeq === Seq("a2"))
  }
}

object ScdMergeSpec {
  val dimUser: ScdSchema = ScdSchema(
    businessKeys = Seq("login"),
    type1Cols = Seq("name", "surname", "year_of_birth"),
    type2Cols = Seq("premium_user", "address", "phone"),
    surrogateCol = "dim_user_id")

  def ts(s: String): Timestamp = Timestamp.valueOf(s)
  val high: Timestamp = ts("9999-12-31 23:59:59")
  val asOf: Timestamp = ts("2024-05-25 12:00:00")

  val prodSchema: StructType = StructType(Seq(
    StructField("dim_user_id", IntegerType),
    StructField("login", StringType),
    StructField("premium_user", BooleanType),
    StructField("address", StringType),
    StructField("phone", StringType),
    StructField("name", StringType),
    StructField("surname", StringType),
    StructField("year_of_birth", IntegerType),
    StructField("scd_version", IntegerType),
    StructField("scd_start_date", TimestampType),
    StructField("scd_end_date", TimestampType),
    StructField("scd_active", BooleanType)))

  val stagSchema: StructType = StructType(Seq(
    StructField("login", StringType),
    StructField("name", StringType),
    StructField("surname", StringType),
    StructField("year_of_birth", IntegerType),
    StructField("premium_user", BooleanType),
    StructField("address", StringType),
    StructField("phone", StringType)))
}
