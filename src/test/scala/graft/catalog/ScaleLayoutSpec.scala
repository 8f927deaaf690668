package graft.catalog

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Physical-layout scale mechanics: bucketed co-located joins (no
  * shuffle) and partition pruning on catalog tables.
  */
class ScaleLayoutSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS customer_bkt")
    Tables(spark, dir, "orders")
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_bkt")
    Tables(spark, dir, "customer")
      .withColumn("c_custkey", col("c_custkey")) // long, same as o_custkey
      .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("customer_bkt")
    // force the sort-merge path (the tables are tiny, so the planner
    // would otherwise broadcast and skip bucketing entirely)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_bkt")
        .join(spark.table("customer_bkt"),
          col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(plan.contains("Bucketed: true"), s"expected bucketed scans:\n$plan")
      // same result as the unbucketed join
      val plain = Tables(spark, dir, "orders").join(
        Tables(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      assert(joined.count() === plain.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("SCD merge over bucketed tables joins without shuffling either side") {
    import graft.scd.{MergeOptions, ScdMerge, ScdMergeSpec}
    val dir = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS dim_bkt")
    spark.sql("DROP TABLE IF EXISTS stag_bkt")
    val cust = Tables(spark, dir, "customer")
    cust.select(col("c_custkey").cast("int").as("dim_user_id"),
        concat(lit("u"), col("c_custkey")).as("login"),
        (col("c_custkey") % 2 === 0).as("premium_user"),
        col("c_mktsegment").as("address"), lit("555").as("phone"),
        col("c_name").as("name"), lit("x").as("surname"),
        lit(1980).as("year_of_birth"), lit(1).as("scd_version"),
        lit("2024-01-01 00:00:00").cast("timestamp").as("scd_start_date"),
        lit("9999-12-31 23:59:59").cast("timestamp").as("scd_end_date"),
        lit(true).as("scd_active"))
      .write.bucketBy(8, "login").sortBy("login").saveAsTable("dim_bkt")
    cust.select(concat(lit("u"), col("c_custkey")).as("login"),
        col("c_name").as("name"), lit("x").as("surname"),
        lit(1980).as("year_of_birth"),
        (col("c_custkey") % 3 === 0).as("premium_user"),
        col("c_mktsegment").as("address"), lit("556").as("phone"))
      .write.bucketBy(8, "login").sortBy("login").saveAsTable("stag_bkt")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val merged = ScdMerge.merge(spark.table("dim_bkt"),
        spark.table("stag_bkt"), ScdMergeSpec.dimUser,
        MergeOptions(ScdMergeSpec.asOf))
      merged.count() // execute so AQE finalizes the plan
      val plan = merged.queryExecution.executedPlan.toString
      // the full-outer merge join consumes the bucketed layout directly:
      // Sort sits straight on the bucketed scans, and NO join-key
      // shuffle (Exchange hashpartitioning) exists anywhere. (The only
      // exchanges left are SinglePartition ones: the max-surrogate
      // aggregate and the NEW-rows-only ranking window — both sized by
      // the increment, not the dimension.)
      assert(plan.contains("SortMergeJoin") && plan.contains("FullOuter"),
        s"expected a full-outer sort-merge join:\n$plan")
      assert(plan.contains("Bucketed: true"),
        s"expected bucketed scans:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"merge join shuffled a bucketed side:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("declared q89 merges from bucketed layout with zero join-key shuffle") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the sort-merge path the layout exists for (at real scale
      // neither side broadcasts)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val merged = graft.queries.ScdQueries.queries("q89_scd_bucketed")(
        spark, "/root/testdata/sf0.001")
      merged.collect() // AQE finalizes on the SAME Dataset
      val plan = merged.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") && plan.contains("FullOuter"),
        s"expected a full-outer sort-merge join:\n$plan")
      assert(plan.contains("Bucketed: true"), s"expected bucketed scans:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"declared bucketed merge shuffled a join side:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("z-order clustering shrinks per-file ranges on every dimension") {
    val dir = Files.createTempDirectory("graft-zorder").toString
    val orders = Tables(spark, "/root/testdata/sf0.001", "orders")
    val nFiles = 8
    ZOrder.cluster(orders, Seq("o_custkey", "o_totalprice"), nFiles)
      .write.mode("overwrite").parquet(dir)
    val rd = spark.read.parquet(dir)
      .withColumn("f", input_file_name())
    val g = orders.agg(
      min("o_custkey").cast("double"), max("o_custkey").cast("double"),
      min("o_totalprice"), max("o_totalprice")).head()
    val (kLo, kHi, pLo, pHi) =
      (g.getDouble(0), g.getDouble(1), g.getDouble(2), g.getDouble(3))
    val perFile = rd.groupBy("f").agg(
      min("o_custkey").cast("double").as("kmn"),
      max("o_custkey").cast("double").as("kmx"),
      min("o_totalprice").as("pmn"), max("o_totalprice").as("pmx"))
      .collect()
    assert(perFile.length === nFiles)
    // a centered query box covering 1/4 of each dimension: a random
    // layout intersects EVERY file's min/max box; the z-ordered layout
    // must exclude at least half the files on stats alone
    val (qkLo, qkHi) = (kLo + (kHi - kLo) * 0.375, kLo + (kHi - kLo) * 0.625)
    val (qpLo, qpHi) = (pLo + (pHi - pLo) * 0.375, pLo + (pHi - pLo) * 0.625)
    val touched = perFile.count { r =>
      r.getDouble(2) >= qkLo && r.getDouble(1) <= qkHi &&
        r.getDouble(4) >= qpLo && r.getDouble(3) <= qpHi
    }
    assert(touched <= nFiles / 2,
      s"query box touched $touched of $nFiles z-ordered files")
    // and the layout is only a reordering: same rows
    assert(rd.drop("f").count() === orders.count())
  }

  test("dynamic partition pruning: a dim-side filter prunes fact partitions at runtime") {
    // the 100 TB star-join shape: the fact table is partitioned on the
    // join key's domain and the dimension filter is only known at run
    // time — DPP injects a subquery filter into the fact scan so whole
    // partitions never leave storage
    import spark.implicits._
    val cat = new ParquetCatalog(spark,
      Files.createTempDirectory("graft-dpp").toString)
    val ev = Tables(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "user_id", "event_type", "value")
    cat.create("events_dpp", ev.schema)
    cat.overwrite("events_dpp", ev, partitionBy = Seq("event_type"))
    // the dim must be a FILE source: an inline local relation constant-
    // folds its filter away and DPP sees no selective predicate
    val dimDir = Files.createTempDirectory("graft-dpp-dim").toString
    // the filter must be a comparison Catalyst considers "likely
    // selective" (a bare boolean attribute is not)
    Seq(("click", 1), ("view", 2), ("purchase", 3))
      .toDF("event_type", "grade")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    // benefit heuristic is stats-based and vetoes on test-sized inputs;
    // force the fallback ratio path so the rule itself is exercised
    val conf = spark.conf
    val k = "spark.sql.optimizer.dynamicPartitionPruning.useStats"
    val k2 = "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio"
    val saved = Seq(k, k2).map(x => x -> conf.getOption(x)).toMap
    try {
      conf.set(k, "false")
      conf.set(k2, "10000")
      val joined = cat.table("events_dpp")
        .join(dim.filter(col("grade") === 1), Seq("event_type"))
      assert(joined.collect().length ===
        ev.filter(col("event_type") === "click").count())
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"), s"no DPP filter in:\n$plan")
    } finally saved.foreach { case (key, v) =>
      v.fold(conf.unset(key))(conf.set(key, _))
    }
  }

  test("nested struct field selection prunes the parquet ReadSchema") {
    // at 100 TB a wide metadata struct must not ride along when one
    // field is projected — Spark's nestedSchemaPruning (on by default)
    // narrows the scan to the selected leaf
    val dir = Files.createTempDirectory("graft-nested").toString
    Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"),
        struct(col("lang"), col("source"), col("text"), col("n_chars"))
          .as("meta"))
      .write.mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir).select(col("doc_id"), col("meta.lang"))
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("ReadSchema: struct<doc_id:bigint,meta:struct<lang:string>>"),
      s"expected nested pruning in scan:\n$scan")
    assert(q.count() === 500)
  }

  test("partitioned catalog table prunes partitions under a key predicate") {
    val cat = new ParquetCatalog(spark,
      Files.createTempDirectory("graft-part").toString)
    val ev = Tables(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "user_id", "event_type", "value")
    cat.create("events_p", ev.schema)
    cat.overwrite("events_p", ev, partitionBy = Seq("event_type"))
    val types = ev.select("event_type").distinct().count()
    assert(types > 1)
    val filtered = cat.table("events_p")
      .filter(col("event_type") === "click")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type") ||
      plan.contains("PartitionFilters: [(event_type"),
      s"expected partition filters in:\n$plan")
    // pruned scan reads strictly fewer files than the full table scan
    val allFiles = cat.table("events_p").inputFiles.length
    val readFiles = filtered.inputFiles.length
    assert(readFiles <= allFiles)
    assert(filtered.count() ===
      ev.filter(col("event_type") === "click").count())
  }
}
