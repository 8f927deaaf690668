package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on
  * by default) handles most skew at runtime; salting is the explicit
  * fallback when one key is hot enough that even split partitions bottom
  * out — the big side scatters each key across `saltBuckets` shuffle
  * partitions and the small side is replicated `saltBuckets` times, so a
  * single hot key parallelizes across `saltBuckets` tasks instead of one.
  */
object SkewJoin {

  /** Inner equi-join of `big` (skewed) against `small` on `keys`.
    * Result is identical to `big.join(small, keys)` — asserted in tests.
    */
  def salted(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      saltBuckets: Int = 16): DataFrame = {
    require(saltBuckets > 1, "saltBuckets must be > 1")
    // per-row round-robin scatter independent of row CONTENT: identical
    // duplicate rows of a hot key must still spread across buckets (a
    // content hash would send them all to one), and salt choice never
    // affects the join result, only the distribution
    val saltedBig = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(saltBuckets)).cast("int"))
    val saltedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedBig
      .join(saltedSmall, keys :+ "__salt")
      .drop("__salt")
  }
}
