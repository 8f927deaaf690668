package graft.scd

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Type-3 shift semantics and the Type-4 current/history split. */
class ScdVariantsSpec extends SparkSpec {
  import ScdMergeSpec._

  private val prod3Schema = StructType(Seq(
    StructField("login", StringType),
    StructField("address", StringType),
    StructField("prev_address", StringType),
    StructField("phone", StringType),
    StructField("prev_phone", StringType)))

  private val stag3Schema = StructType(Seq(
    StructField("login", StringType),
    StructField("address", StringType),
    StructField("phone", StringType)))

  test("type 3: change shifts current into prev; unchanged keeps prev; insert NULL prev") {
    val prod = spark.createDataFrame(java.util.Arrays.asList(
      Row("u1", "a1", "a0", "p1", null), // address will change, phone won't
      Row("u2", "a2", null, "p2", "p0"), // absent from staging -> carried
      Row("u3", "a3", "aX", null, null)  // NULL phone gets a value
    ), prod3Schema)
    val stag = spark.createDataFrame(java.util.Arrays.asList(
      Row("u1", "a1b", "p1"),
      Row("u3", "a3", "p3"),
      Row("u4", "a4", "p4")              // brand new
    ), stag3Schema)
    val got = ScdVariants
      .mergeType3(prod, stag, Seq("login"), Seq("address", "phone"))
      .collect().map(r => r.getString(0) -> r.toSeq).toMap
    assert(got("u1") === Seq("u1", "a1b", "a1", "p1", null)) // shift + keep
    assert(got("u2") === Seq("u2", "a2", null, "p2", "p0"))  // carried
    // NULL -> value IS a change (null-safe): prev becomes the old NULL
    assert(got("u3") === Seq("u3", "a3", "aX", "p3", null))
    assert(got("u4") === Seq("u4", "a4", null, "p4", null))  // insert
    assert(got.size === 4)
  }

  test("type 4: current is one active row per key; history gets this run's closures") {
    val production = spark.createDataFrame(java.util.Arrays.asList(
      Row(1, "user1", true, "address1", "123456789", "John", "Doe", 1980, 1,
        ts("2024-04-01 00:00:00"), high, true),
      Row(2, "user2", false, "address2", null, "Alice", "Smith", 1990, 1,
        ts("2024-04-01 00:00:00"), high, true)
    ), prodSchema)
    val staging = spark.createDataFrame(java.util.Arrays.asList(
      Row("user1", "John", "Doe", 1985, true, "address1", "987654321"),
      Row("user2", "Alice", "Smith", 1990, true, "address2", null),
      Row("user3", "Emma", "Johnson", 1985, true, "address3", "987654321")
    ), stagSchema)
    val r = ScdVariants.mergeType4(production, staging, dimUser,
      MergeOptions(asOf))
    val cur = r.current.collect()
    assert(cur.length === 3) // one active row per surviving key
    assert(cur.forall(_.getBoolean(11)))
    assert(r.current.groupBy("login").count()
      .filter(col("count") > 1).count() === 0)
    val hist = r.historyAppend.collect()
    assert(hist.length === 2) // user1+user2 v1 closed this run
    assert(hist.forall(row => !row.getBoolean(11) && row.getTimestamp(10) == asOf))
  }

  test("type 6: every version carries the member's CURRENT type-2 values") {
    val production = spark.createDataFrame(java.util.Arrays.asList(
      Row(1, "user1", true, "address1", "123456789", "John", "Doe", 1980, 1,
        ts("2024-04-01 00:00:00"), high, true),
      Row(2, "user2", false, "address2", null, "Alice", "Smith", 1990, 1,
        ts("2024-04-01 00:00:00"), high, true)
    ), prodSchema)
    val staging = spark.createDataFrame(java.util.Arrays.asList(
      Row("user1", "John", "Doe", 1985, true, "addressX", "123456789"),
      Row("user3", "Emma", "Johnson", 1985, true, "address3", "987654321")
    ), stagSchema)
    val out = ScdVariants.mergeType6(production, staging, dimUser,
      MergeOptions(asOf)).collect()
      .map(r => (r.getString(1), r.getInt(8)) -> r).toMap
    // user1 has two versions now; BOTH carry the current address
    assert(out(("user1", 1)).getAs[String]("cur_address") === "addressX")
    assert(out(("user1", 2)).getAs[String]("cur_address") === "addressX")
    assert(out(("user1", 1)).getAs[String]("address") === "address1") // history intact
    // user2 untouched: current == own value; user3 insert: same
    assert(out(("user2", 1)).getAs[String]("cur_address") === "address2")
    assert(out(("user3", 1)).getAs[String]("cur_address") === "address3")
    assert(out(("user2", 1)).getAs[String]("cur_phone") === null)
  }
}
