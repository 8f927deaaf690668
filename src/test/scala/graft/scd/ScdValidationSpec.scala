package graft.scd

import graft.SparkSpec

/** Negative paths: declared-schema mismatches must fail fast with a
  * message naming the missing columns, not produce a wrong merge.
  */
class ScdValidationSpec extends SparkSpec {
  import ScdMergeSpec._
  import spark.implicits._

  test("merge rejects production missing declared columns") {
    val bad = Seq((1, "u1")).toDF("dim_user_id", "login")
    val staging = Seq(("u1", "n", "s", 1990, true, "a", "p"))
      .toDF("login", "name", "surname", "year_of_birth", "premium_user",
        "address", "phone")
    val e = intercept[IllegalArgumentException](
      ScdMerge.merge(bad, staging, dimUser, MergeOptions(asOf)))
    assert(e.getMessage.contains("production is missing"))
    assert(e.getMessage.contains("premium_user"))
  }

  test("merge rejects staging missing declared columns") {
    val production = spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](), prodSchema)
    val bad = Seq(("u1", "n")).toDF("login", "name")
    val e = intercept[IllegalArgumentException](
      ScdMerge.merge(production, bad, dimUser, MergeOptions(asOf)))
    assert(e.getMessage.contains("staging is missing"))
    assert(e.getMessage.contains("address"))
  }

  test("schema declaration rejects empty key or type2 lists") {
    intercept[IllegalArgumentException](
      ScdSchema(Seq.empty, Seq("a"), Seq("b")))
    intercept[IllegalArgumentException](
      ScdSchema(Seq("k"), Seq("a"), Seq.empty))
  }
}
