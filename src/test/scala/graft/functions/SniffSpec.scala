package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The deterministic chardet posture: the q301 oracle's theorem —
  * each fixture plant pair strictly selects its own codec — is
  * asserted here byte-for-byte, plus the abstain/default paths.
  */
class SniffSpec extends AnyFunSuite {

  private def det(s: String, cs: String): String =
    Sniff.detect(s.getBytes(java.nio.charset.Charset.forName(cs))).toString

  test("fixture plants encode to the analyzed byte pairs") {
    def hx(s: String, cs: String): String =
      s.getBytes(java.nio.charset.Charset.forName(cs))
        .map(b => f"${b & 0xff}%02X").mkString
    assert(hx("つで", "windows-31j") == "82C282C5")
    assert(hx("だつ", "EUC-JP") == "A4C0A4C4")
    assert(hx("中主", "GBK") == "D6D0D6F7")
    assert(hx("並事", "Big5-HKSCS") == "A8C3A8C6")
    assert(hx("겴겷", "x-windows-949") == "81C081C3")
  }

  test("each planted class sniffs to its own codec") {
    assert(det("word つ and で done", "windows-31j") == "shift_jis")
    assert(det("word だ and つ done", "EUC-JP") == "euc-jp")
    assert(det("word 中 and 主 done", "GBK") == "gbk")
    assert(det("word 並 and 事 done", "Big5-HKSCS") == "big5")
    assert(det("word 겴 and 겷 done", "x-windows-949") == "euc-kr")
    // single-plant docs decide too (per-pair strict dominance)
    assert(det("only つ here", "windows-31j") == "shift_jis")
    assert(det("only 겷 here", "x-windows-949") == "euc-kr")
    // adjacency cannot misalign the 2-byte pairs
    assert(det("つでつで run", "windows-31j") == "shift_jis")
  }

  test("utf-8, ascii, and abstain paths") {
    assert(det("café résumé", "UTF-8") == "utf-8")
    assert(det("plain ascii only", "UTF-8") == "")
    // an isolated high byte (cp1252 dash before a space) gives an
    // odd-length run: every CJK candidate dies, the sniff abstains
    assert(Sniff.detect(Array[Byte](
      'a'.toByte, 0x97.toByte, ' '.toByte, 'b'.toByte)).toString == "")
    // a valid-UTF-8 pair wins over the legacy interpretations
    assert(det("éü adjacent", "UTF-8") == "utf-8")
    // NULL-free: empty input abstains
    assert(Sniff.detect(Array[Byte]()).toString == "")
  }
}
