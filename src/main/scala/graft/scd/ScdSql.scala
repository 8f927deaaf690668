package graft.scd

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL front door: the reference's 8-statement HiveQL pipeline
  * (reference `SCD_script.txt:1-155`) generated for any [[ScdSchema]] and
  * executed verbatim through `spark.sql` against session-catalog tables.
  * Spark parses the whole reference surface natively: `DROP TABLE IF
  * EXISTS`, `CREATE TABLE LIKE`, multi-`INSERT INTO`, `LEFT JOIN ... IS
  * NULL` anti joins, `ROW_NUMBER() OVER`, `INSERT OVERWRITE` (operators
  * O1-O24 of SURVEY.md §2.1 in their original SQL shape).
  *
  * Fidelity note: `asOfSql` DEFAULTS to `current_timestamp()` exactly
  * like the reference — including its per-statement evaluation and the
  * resulting interval gaps (SURVEY.md §2.3(5)); pass a timestamp literal
  * for deterministic, gapless runs (tests do). The one always-on
  * divergence: the step-8 renumbering window gets a total-order tiebreak
  * so surrogate assignment is deterministic (SURVEY.md §2.3(4)).
  */
object ScdSql {

  /** Generate the 8 statements for `schema` over catalog tables. */
  def statements(
      spark: SparkSession,
      schema: ScdSchema,
      prodTable: String,
      stagTable: String,
      tmpTable: String,
      asOfSql: String,
      highDateSql: String = "TIMESTAMP '9999-12-31 23:59:59'",
      coalesceCols: Set[String] = Set.empty): Seq[String] = {
    val cols = spark.table(prodTable).columns.toSeq
    val surType = spark.table(prodTable).schema(schema.surrogateCol).dataType.sql
    def p(c: String) = s"p.`$c`"
    def s_(c: String) = s"s.`$c`"
    val keyOn = schema.businessKeys.map(k => s"${p(k)} = ${s_(k)}")
      .mkString(" AND ")
    def eq(c: String) =
      if (coalesceCols(c))
        s"COALESCE(CAST(${p(c)} AS STRING),'') = COALESCE(CAST(${s_(c)} AS STRING),'')"
      else s"${p(c)} = ${s_(c)}"
    def ne(c: String) =
      if (coalesceCols(c))
        s"COALESCE(CAST(${p(c)} AS STRING),'') != COALESCE(CAST(${s_(c)} AS STRING),'')"
      else s"${p(c)} != ${s_(c)}"
    val unchanged = schema.type2Cols.map(eq).mkString(" AND ")
    val changed = schema.type2Cols.map(ne).mkString(" OR ")

    def proj(f: String => String): String =
      cols.map(c => s"${f(c)} AS `$c`").mkString(", ")
    val t1Refresh: String => String =
      c => if (schema.type1Cols.contains(c)) s_(c) else p(c)
    val closeRow: String => String = c =>
      if (schema.type1Cols.contains(c)) s_(c)
      else if (c == schema.endCol) asOfSql
      else if (c == schema.activeCol) "false"
      else p(c)
    def openRow(versionSql: String): String => String = c =>
      if (c == schema.surrogateCol) s"CAST(NULL AS $surType)"
      else if (c == schema.versionCol) versionSql
      else if (c == schema.startCol) asOfSql
      else if (c == schema.endCol) highDateSql
      else if (c == schema.activeCol) "true"
      else s_(c)

    val renumberOrder = (schema.startCol +: schema.businessKeys :+
      schema.versionCol).map(c => s"`$c`").mkString(", ")
    val finalProj = cols.map { c =>
      if (c == schema.surrogateCol)
        s"CAST(ROW_NUMBER() OVER (ORDER BY $renumberOrder) AS $surType) AS `$c`"
      else s"`$c`"
    }.mkString(", ")

    Seq(
      // step 1 (SCD_script.txt:2-4): scratch table
      s"DROP TABLE IF EXISTS $tmpTable",
      s"CREATE TABLE $tmpTable LIKE $prodTable",
      // step 2 (:6-12): B1 — production members absent from staging
      s"""INSERT INTO $tmpTable
         |SELECT ${proj(p)} FROM $prodTable p
         |LEFT JOIN $stagTable s ON $keyOn
         |WHERE ${s_(schema.businessKeys.head)} IS NULL""".stripMargin,
      // step 3 (:14-32): B2 — inactive history, Type-1 refreshed
      s"""INSERT INTO $tmpTable
         |SELECT ${proj(t1Refresh)} FROM $prodTable p
         |JOIN $stagTable s ON $keyOn AND ${p(schema.activeCol)} = false""".stripMargin,
      // step 4 (:35-56): B3 — active, no Type-2 change
      s"""INSERT INTO $tmpTable
         |SELECT ${proj(t1Refresh)} FROM $prodTable p
         |JOIN $stagTable s ON $keyOn AND ${p(schema.activeCol)} = true
         |WHERE $unchanged""".stripMargin,
      // step 5 (:59-80): B4 — close the changed active version
      s"""INSERT INTO $tmpTable
         |SELECT ${proj(closeRow)} FROM $prodTable p
         |JOIN $stagTable s ON $keyOn AND ${p(schema.activeCol)} = true
         |WHERE $changed""".stripMargin,
      // step 6 (:83-116): B5 — open the successor version
      s"""INSERT INTO $tmpTable
         |SELECT ${proj(openRow(s"${p(schema.versionCol)} + 1"))}
         |FROM $prodTable p
         |JOIN $stagTable s ON $keyOn AND ${p(schema.activeCol)} = true
         |WHERE $changed""".stripMargin,
      // step 7 (:119-137): B6 — brand-new members
      s"""INSERT INTO $tmpTable
         |SELECT ${proj(openRow("1"))} FROM $stagTable s
         |LEFT JOIN $prodTable p ON $keyOn
         |WHERE ${p(schema.businessKeys.head)} IS NULL""".stripMargin,
      // step 8 (:139-155): renumber + atomic publish
      s"""INSERT OVERWRITE TABLE $prodTable
         |SELECT $finalProj FROM $tmpTable""".stripMargin
    )
  }

  /** Execute the pipeline; returns the republished production table. */
  def run(
      spark: SparkSession,
      schema: ScdSchema,
      prodTable: String,
      stagTable: String,
      tmpTable: String = "dim_scd_scratch",
      asOfSql: String = "current_timestamp()",
      highDateSql: String = "TIMESTAMP '9999-12-31 23:59:59'",
      coalesceCols: Set[String] = Set.empty): DataFrame = {
    statements(spark, schema, prodTable, stagTable, tmpTable, asOfSql,
      highDateSql, coalesceCols).foreach(spark.sql(_))
    spark.table(prodTable)
  }
}
