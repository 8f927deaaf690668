package graft

import org.scalatest.funsuite.AnyFunSuite

/** The oracle-dump CTE materializer: a WITH-chain walker, not a line
  * regex — WINDOW clauses, recursive members with column lists and
  * string literals must pass through untouched.
  */
class VerifySpec extends AnyFunSuite {

  test("materializes every member of a WITH chain") {
    val sql = "WITH a AS (SELECT 1), b AS (SELECT 2) SELECT * FROM b"
    assert(Verify.materializeCtes(sql) ==
      "WITH a AS MATERIALIZED (SELECT 1), " +
        "b AS MATERIALIZED (SELECT 2) SELECT * FROM b")
  }

  test("members on their own lines (the composed-oracle shape)") {
    val sql =
      """WITH
        |a AS (
        |  SELECT 1 AS x
        |),
        |b AS (
        |  SELECT x FROM a
        |)
        |SELECT * FROM b""".stripMargin
    val out = Verify.materializeCtes(sql)
    assert(out.contains("a AS MATERIALIZED ("))
    assert(out.contains("b AS MATERIALIZED ("))
  }

  test("multi-definition WINDOW clause continuation lines untouched") {
    val sql =
      """WITH a AS (SELECT 1 AS x) SELECT sum(x) OVER w, sum(x) OVER w2
        |FROM a WINDOW w AS (ORDER BY x),
        |w2 AS (ORDER BY x DESC)""".stripMargin
    val out = Verify.materializeCtes(sql)
    assert(out.contains("a AS MATERIALIZED ("))
    // the round-10 line regex rewrote `w2 AS (` into invalid SQL
    assert(out.contains("w2 AS (ORDER BY x DESC)"))
    assert(!out.contains("w2 AS MATERIALIZED"))
    assert(out.contains("WINDOW w AS (ORDER BY x)"))
  }

  test("recursive members with a column list untouched") {
    val sql = "WITH RECURSIVE seed AS (SELECT 1 AS n), " +
      "reach(node, lab) AS (SELECT n, n FROM seed UNION ALL " +
      "SELECT node + 1, lab FROM reach WHERE node < 3) " +
      "SELECT * FROM reach"
    val out = Verify.materializeCtes(sql)
    assert(out.contains("seed AS MATERIALIZED ("))
    assert(out.contains("reach(node, lab) AS (SELECT"))
  }

  test("already-hinted members are not double-hinted") {
    val sql = "WITH a AS MATERIALIZED (SELECT 1), " +
      "b AS NOT MATERIALIZED (SELECT 2) SELECT * FROM a, b"
    assert(Verify.materializeCtes(sql) == sql)
  }

  test("WITH inside a string literal is not a chain") {
    val sql = "SELECT 'WITH x AS (broken' AS s, 1 AS y"
    assert(Verify.materializeCtes(sql) == sql)
  }

  test("parens and commas inside string literals do not unbalance") {
    val sql = "WITH a AS (SELECT '), b AS (' AS tricky), " +
      "b AS (SELECT ''',(''' AS t2) SELECT * FROM a, b"
    val out = Verify.materializeCtes(sql)
    assert(out.contains("a AS MATERIALIZED (SELECT '), b AS ('"))
    assert(out.contains("b AS MATERIALIZED (SELECT ''',('''"))
  }

  test("nested WITH inside a CTE body is materialized too") {
    val sql = "WITH outer1 AS (WITH inner1 AS (SELECT 1) " +
      "SELECT * FROM inner1) SELECT * FROM outer1"
    val out = Verify.materializeCtes(sql)
    assert(out.contains("outer1 AS MATERIALIZED (WITH " +
      "inner1 AS MATERIALIZED (SELECT 1)"))
  }

  test("line comments are skipped, not parsed") {
    val sql =
      """WITH a AS ( -- comment with WITH b AS ( inside
        |  SELECT 1
        |)
        |SELECT * FROM a""".stripMargin
    val out = Verify.materializeCtes(sql)
    assert(out.contains("a AS MATERIALIZED ("))
    assert(out.contains("-- comment with WITH b AS ( inside"))
  }
}
