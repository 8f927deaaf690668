package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection + scrubbing for release-compliance passes over a
  * training corpus: emails, IPv4s, phone numbers, IBAN-shaped account
  * ids (pattern detection), and credit-card numbers with a LUHN
  * checksum — card-shaped strings are only scrubbed when the checksum
  * validates, so order numbers and other 16-digit noise survive.
  *
  * Every pattern stays inside the Java-regex/RE2 common subset
  * (explicit classes, ASCII `\b`, no lookaround, no backreferences) so
  * the DuckDB oracle replays matches exactly. The Luhn checksum is an
  * explicit 16-term integer expression (digits doubled at odd from-left
  * positions for a normalized 16-digit string) — pure codegen, no UDF;
  * the only higher-order functions are the per-match filter/fold over a
  * document's card candidates, bounded by matches-per-doc (never a
  * corpus-scale hot path).
  *
  * At 100 TB: one scan, all per-row — embarrassingly parallel, no
  * shuffle at all; composable as a streaming batch gate.
  */
object Pii {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}\\b"
  val PhoneRe = "[+][0-9]{1,2}-[0-9]{3}-[0-9]{3,4}(-[0-9]{2,4})?"
  val IbanRe = "\\b[A-Z]{2}[0-9]{2}[A-Z0-9]{12,30}\\b"
  val CardRe =
    "\\b[0-9]{4}[ -][0-9]{4}[ -][0-9]{4}[ -][0-9]{4}\\b|\\b[0-9]{16}\\b"

  /** Strip card separators: "4539 1488-0343 6467" -> 16 digits. */
  def cardDigits(c: Column): Column =
    regexp_replace(c, "[ -]", "")

  def cardDigitsSql(e: String): String =
    s"regexp_replace($e, '[ -]', '', 'g')"

  /** Luhn checksum over a normalized 16-digit string: digits at odd
    * from-left positions (even from-right) double, 10+ folds to
    * digit-sum minus 9; valid iff the total is 0 mod 10.
    */
  def luhn16(d: Column): Column =
    (1 to 16).map { j =>
      val dig = substring(d, j, 1).cast("int")
      if (j % 2 == 1) {
        val t = dig * lit(2)
        when(t > 9, t - 9).otherwise(t)
      } else dig
    }.reduce(_ + _) % 10 === 0

  /** DuckDB twin of [[luhn16]]. */
  def luhn16Sql(e: String): String =
    "((" + (1 to 16).map { j =>
      val dig = s"CAST(substring($e, $j, 1) AS INTEGER)"
      if (j % 2 == 1) s"(CASE WHEN 2*$dig > 9 THEN 2*$dig - 9 ELSE 2*$dig END)"
      else dig
    }.mkString(" + ") + ") % 10 = 0)"

  /** Card-shaped substrings of `t`, in match order. */
  def cardMatches(t: Column): Column =
    regexp_extract_all(t, lit(CardRe), lit(0))

  /** The Luhn-valid subset of [[cardMatches]] (original matched
    * literals, separators intact — usable for literal replacement).
    */
  def validCards(t: Column): Column =
    filter(cardMatches(t), c => luhn16(cardDigits(c)))

  /** Scrub all PII classes from `t`: regex replacement for the
    * pattern-only classes, literal replacement for each Luhn-VALID card
    * (a strict left fold in match order — shaped-but-invalid numbers
    * are preserved).
    */
  def scrub(t: Column): Column = {
    val base =
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(t, EmailRe, "<EMAIL>"),
            Ipv4Re, "<IP>"),
          PhoneRe, "<PHONE>"),
        IbanRe, "<IBAN>")
    aggregate(validCards(base), base, (acc, c) => replace(acc, c, lit("<CARD>")))
  }

  /** DuckDB twin of [[scrub]] over text expression `e`. */
  def scrubSql(e: String): String = {
    val base =
      s"""regexp_replace(regexp_replace(regexp_replace(regexp_replace($e,
         |    '$EmailRe', '<EMAIL>', 'g'),
         |    '$Ipv4Re', '<IP>', 'g'),
         |    '$PhoneRe', '<PHONE>', 'g'),
         |    '$IbanRe', '<IBAN>', 'g')""".stripMargin
    s"""list_reduce(
       |  [$base] ||
       |    list_filter(regexp_extract_all($base, '$CardRe'),
       |      c -> ${luhn16Sql(cardDigitsSql("c"))}),
       |  (acc, c) -> replace(acc, c, '<CARD>'))""".stripMargin
  }
}
