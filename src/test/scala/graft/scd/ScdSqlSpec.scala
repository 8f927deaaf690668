package graft.scd

import graft.SparkSpec
import org.apache.spark.sql.Row

/** The reference pipeline executed as literal SQL through `spark.sql`,
  * checked for exact equivalence with the engine's single-pass merge in
  * hiveCompat mode on the golden example.
  */
class ScdSqlSpec extends SparkSpec {
  import ScdMergeSpec._

  test("8-statement SQL pipeline == engine hiveCompat merge (golden example)") {
    spark.sql("DROP TABLE IF EXISTS dim_user_production")
    spark.sql("DROP TABLE IF EXISTS dim_user_staging")
    val production = spark.createDataFrame(java.util.Arrays.asList(
      Row(1, "user1", true, "address1", "123456789", "John", "Doe", 1980, 1,
        ts("2024-04-01 00:00:00"), high, true),
      Row(2, "user2", false, "address2", null, "Alice", "Smith", 1990, 1,
        ts("2024-04-01 00:00:00"), high, true)), prodSchema)
    val staging = spark.createDataFrame(java.util.Arrays.asList(
      Row("user1", "John", "Doe", 1985, true, "address1", "987654321"),
      Row("user2", "Alice", "Smith", 1990, true, "address2", null),
      Row("user3", "Emma", "Johnson", 1985, true, "address3", "987654321")),
      stagSchema)
    production.write.saveAsTable("dim_user_production")
    staging.write.saveAsTable("dim_user_staging")

    val viaSql = ScdSql.run(spark, dimUser,
      "dim_user_production", "dim_user_staging",
      asOfSql = "TIMESTAMP '2024-05-25 12:00:00'",
      coalesceCols = Set("phone"))

    val viaEngine = ScdMerge.merge(production, staging, dimUser,
      MergeOptions(asOf, keyMode = KeyMode.HiveCompat,
        nullSafeCompare = false, coalesceCompareCols = Set("phone")))

    assert(viaSql.collect().map(_.toSeq).toSet ===
      viaEngine.collect().map(_.toSeq).toSet)
    assert(viaSql.count() === 5)
  }

  test("8-statement SQL pipeline == engine on random fixtures") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val logins = (1 to 6).map(i => s"r$i")
    val genProd = Gen.listOf(for {
      l <- Gen.oneOf(logins)
      prem <- Gen.oneOf(true, false)
      addr <- Gen.oneOf("a1", "a2")
      phone <- Gen.option(Gen.oneOf("p1", "p2"))
    } yield (l, prem, addr, phone)).map(_.distinctBy(_._1))
    val genStag = Gen.listOf(for {
      l <- Gen.oneOf(logins ++ Seq("rNew"))
      prem <- Gen.oneOf(true, false)
      addr <- Gen.oneOf("a1", "a3")
      phone <- Gen.option(Gen.oneOf("p1", "p3"))
    } yield (l, prem, addr, phone)).map(_.distinctBy(_._1))
    val prop = Prop.forAll(genProd, genStag) { (ps, ss) =>
      spark.sql("DROP TABLE IF EXISTS rnd_prod")
      spark.sql("DROP TABLE IF EXISTS rnd_stag")
      val production = spark.createDataFrame(java.util.Arrays.asList(
        ps.zipWithIndex.map { case ((l, prem, a, ph), i) =>
          Row(i + 1, l, prem, a, ph.orNull, "n", "s", 1980, 1,
            ts("2024-04-01 00:00:00"), high, true)
        }: _*), prodSchema)
      val staging = spark.createDataFrame(java.util.Arrays.asList(
        ss.map { case (l, prem, a, ph) =>
          Row(l, "n", "s", 1980, prem, a, ph.orNull)
        }: _*), stagSchema)
      production.write.saveAsTable("rnd_prod")
      staging.write.saveAsTable("rnd_stag")
      val viaSql = ScdSql.run(spark, dimUser, "rnd_prod", "rnd_stag",
        asOfSql = "TIMESTAMP '2024-05-25 12:00:00'",
        coalesceCols = Set("phone"))
      val viaEngine = ScdMerge.merge(production, staging, dimUser,
        MergeOptions(asOf, keyMode = KeyMode.HiveCompat,
          nullSafeCompare = false, coalesceCompareCols = Set("phone")))
      viaSql.collect().map(_.toSeq).toSet ==
        viaEngine.collect().map(_.toSeq).toSet
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(res.passed, res.status.toString)
  }

  test("generated statements mirror the reference's 8-step shape") {
    val stmts = ScdSql.statements(spark, dimUser,
      "dim_user_production", "dim_user_staging", "dim_user_new",
      asOfSql = "current_timestamp()", coalesceCols = Set("phone"))
    assert(stmts.length === 9) // drop + create-like + 6 inserts + overwrite
    assert(stmts(0).startsWith("DROP TABLE IF EXISTS"))
    assert(stmts(1).contains("LIKE"))
    assert(stmts.count(_.startsWith("INSERT INTO")) === 6)
    assert(stmts.last.startsWith("INSERT OVERWRITE"))
    assert(stmts(4).contains("COALESCE(CAST(p.`phone` AS STRING),'')"))
  }
}
