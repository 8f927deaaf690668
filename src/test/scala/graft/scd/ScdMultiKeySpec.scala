package graft.scd

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Composite business keys and bootstrap-from-empty, the generalized
  * cases the reference's single-key pipeline never faces.
  */
class ScdMultiKeySpec extends SparkSpec {
  import spark.implicits._

  val schema2: ScdSchema = ScdSchema(
    businessKeys = Seq("tenant", "login"),
    type1Cols = Seq("name"),
    type2Cols = Seq("plan"),
    surrogateCol = "dim_id")

  def ts(s: String): Timestamp = Timestamp.valueOf(s)
  val high: Timestamp = ts("9999-12-31 23:59:59")
  val asOf: Timestamp = ts("2024-06-01 00:00:00")

  def prod = Seq(
    (1L, "t1", "alice", "Alice", "free", 1, ts("2024-01-01 00:00:00"), high, true),
    (2L, "t2", "alice", "Alice2", "pro", 1, ts("2024-01-01 00:00:00"), high, true)
  ).toDF("dim_id", "tenant", "login", "name", "plan", "scd_version",
    "scd_start_date", "scd_end_date", "scd_active")

  test("composite keys: same login in two tenants versions independently") {
    // t1/alice upgrades plan; t2/alice unchanged; t3/alice is new
    val staging = Seq(
      ("t1", "alice", "Alice", "pro"),
      ("t2", "alice", "Alice2", "pro"),
      ("t3", "alice", "Alice3", "free")
    ).toDF("tenant", "login", "name", "plan")
    val out = ScdMerge.merge(prod, staging, schema2, MergeOptions(asOf))
      .collect().map(r => (r.getString(1), r.getInt(5), r.getBoolean(8),
        r.getString(4))).toSet
    assert(out === Set(
      ("t1", 1, false, "free"), ("t1", 2, true, "pro"), // versioned
      ("t2", 1, true, "pro"),                           // untouched
      ("t3", 1, true, "free")))                         // new member
  }

  test("bootstrap: merging into an empty production inserts all as v1") {
    val empty = prod.filter(lit(false))
    val staging = Seq(("t1", "a", "A", "free"), ("t1", "b", "B", "pro"))
      .toDF("tenant", "login", "name", "plan")
    val out = ScdMerge.merge(empty, staging, schema2, MergeOptions(asOf))
    val rows = out.collect()
    assert(rows.length === 2)
    assert(rows.forall(r => r.getInt(5) == 1 && r.getBoolean(8)))
    assert(rows.map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L)) // ids from 1
  }
}
