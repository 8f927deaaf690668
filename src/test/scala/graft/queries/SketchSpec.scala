package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Accuracy bounds for the sketch query (q29 has no SQL oracle — sketch
  * values are engine-specific — so the contract lives here).
  */
class SketchSpec extends SparkSpec {

  test("HLL cardinality within 5% of exact; median inside the value range") {
    val rows = CoreQueries.queries("q29_sketches")(
      spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_orders").toDouble
      val approx = r.getAs[Long]("approx_orders").toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"HLL error too large: exact=$exact approx=$approx")
      assert(r.getAs[Double]("approx_median_price") > 0)
    }
  }

  test("sketches are deterministic run-to-run") {
    val a = CoreQueries.queries("q29_sketches")(
      spark, "/root/testdata/sf0.001").collect().map(_.toSeq).toSet
    val b = CoreQueries.queries("q29_sketches")(
      spark, "/root/testdata/sf0.001").collect().map(_.toSeq).toSet
    assert(a === b)
  }
}
