package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed global ranking — `ROW_NUMBER() OVER (ORDER BY ...)`
  * without the single-partition window Spark plans for a global sort:
  * [[TwoPhase.prefixSum]] over a constant 1 (a count prefix IS a row
  * number when the order is total).
  *
  * The order must be TOTAL (include a unique tiebreak column) — with
  * ties the within-slice order, and therefore the assigned ranks,
  * would be nondeterministic. Results are independent of the slicing:
  * any monotone cut of a total order yields the same global ranks.
  */
object Ranking {

  def globalRowNumber(df: DataFrame, order: Seq[String],
      as: String = "rn"): DataFrame =
    TwoPhase.prefixSum(df, Nil, order, lit(1L), as)
}
