package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hashing that is bit-for-bit reproducible in the DuckDB oracle.
  *
  * Oracle-checked operators (MinHash, SimHash, fingerprints) need a hash
  * both engines compute identically; md5 is the common denominator:
  * Spark `conv(substr(md5(x),1,15),16,10)` == DuckDB
  * `('0x'||substr(md5(x),1,15))::BIGINT` (15 hex chars = 60 bits, no
  * sign/overflow ambiguity).
  *
  * At 100 TB the portability constraint disappears and [[fast]]
  * (xxhash64, whole-stage-codegen'd, no string materialization) is the
  * drop-in hot-path alternative for anything not oracle-checked. (The
  * LSH planes that once derived from it per-row are now plan-time
  * constants — see `Similarity.hyperplanes`.)
  */
object PortableHash {

  /** 60-bit seeded hash, identical in Spark and DuckDB. */
  def hash60(c: Column, seed: Int): Column =
    conv(substring(md5(concat(lit(s"$seed:"), c)), 1, 15), 16, 10)
      .cast("long")

  /** DuckDB SQL text computing exactly [[hash60]]. */
  def hash60Sql(expr: String, seed: Int): String =
    s"(('0x'||substr(md5('$seed:'||($expr)),1,15))::BIGINT)"

  /** Unseeded 60-bit base hash (one md5 per value). */
  def hash60Base(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** DuckDB SQL text computing exactly [[hash60Base]]. */
  def hash60BaseSql(expr: String): String =
    s"(('0x'||substr(md5($expr),1,15))::BIGINT)"

  /** MinHash family: k universal hashes derived from ONE base hash by
    * affine maps over the Mersenne prime 2^31-1. `a*h31 + b < 2^62`, so
    * the arithmetic is exact in any int64 engine — 12 hash functions for
    * the price of one md5.
    */
  val MinhashPrime = 2147483647L

  def affineParams(i: Int): (Long, Long) = (
    ((i * 2 + 1) * 2654435761L) % MinhashPrime,
    (i * 40503L * 65537L) % MinhashPrime)

  /** i-th family member applied to `h31` (a base hash already reduced
    * mod [[MinhashPrime]]).
    */
  def minhash(h31: Column, i: Int): Column = {
    val (a, b) = affineParams(i)
    (lit(a) * h31 + lit(b)) % lit(MinhashPrime)
  }

  /** DuckDB SQL text computing exactly [[minhash]]. */
  def minhashSql(h31Expr: String, i: Int): String = {
    val (a, b) = affineParams(i)
    s"(($a*($h31Expr) + $b) % $MinhashPrime)"
  }

  /** Non-portable fast path: Spark's codegen'd 64-bit xxhash. */
  def fast(cols: Column*): Column = xxhash64(cols: _*)
}
