package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import graft.scd.ScdSchema
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end incremental SCD maintenance over a real Structured
  * Streaming query (MemoryStream source, foreachBatch sink).
  */
class StreamingScdSpec extends SparkSpec {

  case class Staged(login: String, name: String, premium: Boolean, seq: Long)

  val schema: ScdSchema = ScdSchema(
    businessKeys = Seq("login"),
    type1Cols = Seq("name"),
    type2Cols = Seq("premium"),
    surrogateCol = "dim_id")

  def emptyDim: DataFrame = spark.createDataFrame(
    java.util.Collections.emptyList[org.apache.spark.sql.Row](),
    StructType(Seq(
      StructField("dim_id", LongType),
      StructField("login", StringType),
      StructField("name", StringType),
      StructField("premium", BooleanType),
      StructField("scd_version", IntegerType),
      StructField("scd_start_date", TimestampType),
      StructField("scd_end_date", TimestampType),
      StructField("scd_active", BooleanType))))

  test("foreachBatch stream maintains the dimension across batches") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val source = MemoryStream[Staged]
    // the "table": swapped atomically per batch, as ParquetCatalog would
    @volatile var dim: Array[org.apache.spark.sql.Row] = emptyDim.collect()
    def load(s: org.apache.spark.sql.SparkSession): DataFrame =
      s.createDataFrame(java.util.Arrays.asList(dim: _*), emptyDim.schema)
    def save(df: DataFrame): Unit = dim = df.collect()

    val query = StreamingScd.writer(
      source.toDF(), schema, load, save, "seq",
      batchId => Timestamp.valueOf(s"2024-01-0${batchId + 1} 00:00:00"))
      .start()
    try {
      // batch 0: two members, one with an in-batch duplicate (seq wins)
      source.addData(Staged("u1", "Ann", false, 1),
        Staged("u1", "Ann", true, 2), Staged("u2", "Bob", false, 1))
      query.processAllAvailable()
      val afterB0 = dim.map(r => (r.getString(1), r.getBoolean(3),
        r.getInt(4), r.getBoolean(7))).toSet
      assert(afterB0 === Set(("u1", true, 1, true), ("u2", false, 1, true)))

      // batch 1: u1 premium downgraded -> close v1, open v2
      source.addData(Staged("u1", "Ann", false, 3))
      query.processAllAvailable()
      val afterB1 = dim.map(r => (r.getString(1), r.getBoolean(3),
        r.getInt(4), r.getBoolean(7))).toSet
      assert(afterB1 === Set(
        ("u1", true, 1, false), ("u1", false, 2, true),
        ("u2", false, 1, true)))
      // versions carry the per-batch asOf: v2 starts at batch 1's instant
      val v2 = dim.find(r => r.getString(1) == "u1" && r.getInt(4) == 2).get
      assert(v2.getTimestamp(5) === Timestamp.valueOf("2024-01-02 00:00:00"))
    } finally query.stop()
  }
}
