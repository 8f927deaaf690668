package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualitySpec extends SparkSpec {
  import spark.implicits._
  import Quality._

  private lazy val dim = Seq(10L, 20L).toDF("pk")

  private lazy val df = Seq(
    (Some(10L), 1, 5.0),
    (Some(10L), 1, -1.0),  // duplicate key pair + out-of-range
    (Some(20L), 2, 0.5),
    (Some(99L), 3, 2.0),   // orphan fk
    (None, 4, 11.0)        // null fk + out-of-range
  ).toDF("fk", "seq", "x")

  test("report counts every planted violation; clean rules report zero") {
    val rep = report(df, Seq(
      NotNull("fk"),
      Unique(Seq("fk", "seq")),
      InRange("x", 0.0, 10.0),
      RefIntegrity("fk", dim, "pk"),
      Custom("negative_x", col("x") < 0))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep === Map(
      "not_null(fk)" -> 1L,
      "unique(fk,seq)" -> 1L,
      "in_range(x,0.0,10.0)" -> 2L,
      "ref_integrity(fk)" -> 1L,
      "negative_x" -> 1L))
  }

  test("report rows come back in the caller's rule order") {
    // ref-integrity deliberately interleaved between scalar rules: the
    // fused-aggregate split must not reorder the output
    val names = report(df, Seq(
      NotNull("fk"),
      RefIntegrity("fk", dim, "pk"),
      InRange("x", 0.0, 10.0),
      Custom("negative_x", col("x") < 0))).collect().map(_.getString(0)).toSeq
    assert(names === Seq("not_null(fk)", "ref_integrity(fk)",
      "in_range(x,0.0,10.0)", "negative_x"))
  }

  test("violatingRows returns exactly the offending rows") {
    val dup = violatingRows(df, Unique(Seq("fk", "seq")))
      .select("x").as[Double].collect().toSet
    assert(dup === Set(5.0, -1.0))
    val orphan = violatingRows(df, RefIntegrity("fk", dim, "pk"))
      .select("seq").as[Int].collect().toSeq
    assert(orphan === Seq(3))
    assert(violatingRows(df, NotNull("fk")).count() === 1)
  }
}
