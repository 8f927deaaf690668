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
  * hot-path choice — the LSH-bucketed ANN operator uses it.
  */
object PortableHash {

  /** 60-bit seeded hash, identical in Spark and DuckDB. */
  def hash60(c: Column, seed: Int): Column =
    conv(substring(md5(concat(lit(s"$seed:"), c)), 1, 15), 16, 10)
      .cast("long")

  /** [[hash60]] with the seed supplied as a column (e.g. an exploded
    * hash-function index for MinHash signatures).
    */
  def hash60Dyn(c: Column, seed: Column): Column =
    conv(substring(md5(concat(seed.cast("string"), lit(":"), c)), 1, 15),
      16, 10).cast("long")

  /** DuckDB SQL text computing exactly [[hash60]]. */
  def hash60Sql(expr: String, seed: Int): String =
    s"(('0x'||substr(md5('$seed:'||($expr)),1,15))::BIGINT)"

  /** DuckDB SQL text computing exactly [[hash60Dyn]]. */
  def hash60DynSql(expr: String, seedExpr: String): String =
    s"(('0x'||substr(md5(($seedExpr)::VARCHAR||':'||($expr)),1,15))::BIGINT)"

  /** Non-portable fast path: Spark's codegen'd 64-bit xxhash. */
  def fast(cols: Column*): Column = xxhash64(cols: _*)
}
