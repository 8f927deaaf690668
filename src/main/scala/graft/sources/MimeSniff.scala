package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Magic-byte content sniffing over binary payloads — the WHATWG
  * mime-sniff move every real crawl needs, because declared
  * `Content-Type` headers lie (misconfigured servers label PNGs
  * `text/html` constantly). Recognizes exactly the container formats
  * the engine ships codecs for, plus the gzip member magic and a
  * leading-`<` HTML heuristic; anything else is
  * `application/octet-stream` — never guessed further.
  *
  * Pure codegen'd column work (`substring` on binary + `hex`
  * equality), so the classifier rides the scan: no UDF, no extra
  * pass. Cross-engine note: oracles never sniff bytes — fixtures
  * plant the true type by id arithmetic and the oracle predicts it;
  * the compare proves the sniffer recovers the plant through real
  * storage.
  */
object MimeSniff {

  /** Sniffed media type of a byte buffer ('' input → octet-stream). */
  def sniff(b: Column): Column =
    when(hex(substring(b, 1, 8)) === "89504E470D0A1A0A", "image/png")
      .when(hex(substring(b, 1, 3)) === "FFD8FF", "image/jpeg")
      .when(hex(substring(b, 1, 2)) === "1F8B", "application/gzip")
      .when(hex(substring(b, 1, 4)) === "52494646" &&
        hex(substring(b, 9, 4)) === "57415645", "audio/wav")
      .when(hex(substring(b, 1, 2)) === "424D", "image/bmp")
      // bounded 64-byte prescan only (the HTML5 prescan spirit) —
      // decoding the whole body to test a leading '<' would
      // materialize O(body) string per record. CONTRACT: markup
      // preceded by more than ~63 bytes of leading whitespace sniffs
      // as octet-stream; callers needing the whole-body probe must
      // trim before sniffing.
      .when(decode(substring(b, 1, 64), "ISO-8859-1").rlike("^\\s*<"),
        "text/html")
      .otherwise("application/octet-stream")
}
