package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CSV / JSON-lines / ORC round-trips preserve values bit-for-bit against
  * the Parquet source of truth, including timestamps, nulls, quotes and
  * embedded delimiters.
  */
class FormatsSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-fmt-$name").toString

  test("orders round-trips through CSV, JSON and ORC unchanged") {
    val orders = Tables(spark, "/root/testdata/sf0.001", "orders")
    val schema = orders.schema

    val csvDir = tmp("csv")
    Formats.writeCsv(orders, csvDir)
    val backCsv = Formats.readCsv(spark, csvDir, schema)
    assert(backCsv.schema == schema)
    assert(backCsv.exceptAll(orders).isEmpty && orders.exceptAll(backCsv).isEmpty)

    val jsonDir = tmp("json")
    Formats.writeJson(orders, jsonDir)
    val backJson = Formats.readJson(spark, jsonDir, schema)
    assert(backJson.exceptAll(orders).isEmpty && orders.exceptAll(backJson).isEmpty)

    val orcDir = tmp("orc")
    Formats.writeOrc(orders, orcDir)
    val backOrc = Formats.readOrc(spark, orcDir)
    assert(backOrc.exceptAll(orders).isEmpty && orders.exceptAll(backOrc).isEmpty)
  }

  test("CSV survives quotes, embedded delimiters and nulls") {
    import spark.implicits._
    val nasty = Seq(
      (1L, Some("""plain"""), Some(1.5)),
      (2L, Some("""comma, inside"""), None),
      (3L, Some(""""quoted" text"""), Some(-0.0)),
      (4L, None, Some(Double.MaxValue)),
      (5L, Some("tab\tand trailing space "), Some(1e-300))
    ).toDF("id", "s", "d")
    val dir = tmp("nasty")
    Formats.writeCsv(nasty, dir)
    val back = Formats.readCsv(spark, dir, nasty.schema)
    assert(back.exceptAll(nasty).isEmpty && nasty.exceptAll(back).isEmpty)
  }

  test("CSV values with raw newlines round-trip under multiLine read") {
    import spark.implicits._
    val df = Seq((1L, "line1\nline2"), (2L, "plain")).toDF("id", "s")
    val dir = tmp("nl")
    Formats.writeCsv(df, dir)
    val back = Formats.readCsv(spark, dir, df.schema, multiLine = true)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }

  test("binaryFile reads whole files as BINARY rows, glob-filtered") {
    import java.nio.file.Paths
    val dir = tmp("bin")
    val payloads = Map("a.img" -> Array[Byte](1, 2, 3, -1),
      "b.img" -> Array[Byte](9), "skip.txt" -> Array[Byte](0))
    payloads.foreach { case (n, bytes) =>
      Files.write(Paths.get(dir, n), bytes)
    }
    val rows = Formats.readBinaryFiles(spark, dir, glob = "*.img")
      .select(regexp_extract(col("path"), "([^/]+)$", 1).as("name"),
        col("length"), col("content"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getAs[Array[Byte]]("content").toSeq)).toMap
    assert(rows.keySet == Set("a.img", "b.img")) // glob excluded skip.txt
    assert(rows("a.img") == ((4L, Seq[Byte](1, 2, 3, -1))))
    assert(rows("b.img") == ((1L, Seq[Byte](9))))
  }

  test("text lines round-trip through the line-oriented source") {
    import spark.implicits._
    val df = Seq("alpha", "beta gamma", "").toDF("value")
    val dir = tmp("txt")
    Formats.writeTextLines(df, dir)
    val back = Formats.readTextLines(spark, dir)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }

  test("ORC scan keeps predicate pushdown and column pruning") {
    val orders = Tables(spark, "/root/testdata/sf0.001", "orders")
    val dir = tmp("orc-push")
    Formats.writeOrc(orders, dir)
    val plan = Formats.readOrc(spark, dir)
      .filter(col("o_orderkey") < 100).select("o_orderkey", "o_totalprice")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderkey), LessThan(o_orderkey,100)"),
      plan)
  }
}
