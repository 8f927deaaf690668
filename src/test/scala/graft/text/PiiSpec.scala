package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PII detection/scrub: per-class counts, Luhn validity gating the card
  * scrub, and the full rewrite.
  */
class PiiSpec extends SparkSpec {

  private def one(text: String) = {
    import spark.implicits._
    Seq((1L, text)).toDF("doc_id", "t")
      .select(
        regexp_count(col("t"), lit(Pii.EmailRe)).as("n_email"),
        regexp_count(col("t"), lit(Pii.Ipv4Re)).as("n_ip"),
        regexp_count(col("t"), lit(Pii.PhoneRe)).as("n_phone"),
        size(Pii.cardMatches(col("t"))).as("n_card_shaped"),
        size(Pii.validCards(col("t"))).as("n_card_valid"),
        regexp_count(col("t"), lit(Pii.IbanRe)).as("n_iban"),
        Pii.scrub(col("t")).as("scrubbed"))
      .head()
  }

  test("each class detected and scrubbed") {
    val r = one("mail a@b.com ip 10.0.0.1 tel +1-555-0147 " +
      "iban DE44500105175407324931 end")
    assert(r.getInt(0) === 1 && r.getInt(1) === 1 && r.getInt(2) === 1 &&
      r.getInt(5) === 1)
    assert(r.getString(6) ===
      "mail <EMAIL> ip <IP> tel <PHONE> iban <IBAN> end")
  }

  test("Luhn gates the card scrub: valid replaced, invalid preserved") {
    val r = one("pay 4539 1488 0343 6467 not 4539-1488-0343-6468 " +
      "also 4111111111111111 done")
    assert(r.getInt(3) === 3, "three card-shaped")
    assert(r.getInt(4) === 2, "two Luhn-valid")
    assert(r.getString(6) ===
      "pay <CARD> not 4539-1488-0343-6468 also <CARD> done")
  }

  test("multi-occurrence counting and digit-run boundaries") {
    val r = one("a@b.com c@d.org 12345678901234567 +44-207-946-0958")
    assert(r.getInt(0) === 2)
    // 17-digit run is NOT card-shaped (\\b[0-9]{16}\\b cannot match inside)
    assert(r.getInt(3) === 0)
    assert(r.getInt(2) === 1)
  }

  test("clean text untouched") {
    val r = one("no personal data here 1234 5678")
    assert(r.getInt(3) === 0 && r.getInt(5) === 0)
    assert(r.getString(6) === "no personal data here 1234 5678")
  }
}
