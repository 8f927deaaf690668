package graft.queries

import graft.SparkSpec
import graft.SparkEntry

/** Plan lint across the whole declared query surface: no query may plan
  * a non-broadcast cartesian product. Intentional small-side cross
  * products (brute-force similarity baselines) plan as
  * BroadcastNestedLoopJoin, which is allowed — CartesianProductExec
  * (both sides shuffled, quadratic I/O) is the silent 100 TB killer this
  * guards against.
  */
class PlanLintSpec extends SparkSpec {

  test("no declared query plans CartesianProduct") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, "/root/testdata/sf0.001")
          .queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }
}
