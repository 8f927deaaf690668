package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CJK / legacy multibyte transport decode: WHATWG label
  * normalization for the five families, superset-codec routing
  * (shift_jis → windows-31j, euc-kr → windows-949), and the
  * mojibake-is-visible contract for unmapped labels.
  */
class CjkCharsetSpec extends SparkSpec {
  import spark.implicits._

  private val cases = Seq(
    // (label, jdk fixture codec, sample in the repertoire)
    ("shift_jis", "windows-31j", "日本語のテキスト kana カナ"),
    ("sjis", "windows-31j", "混在 text 漢字"),
    ("ms_kanji", "windows-31j", "旧ラベルの頁"),
    ("x-sjis", "windows-31j", "外字なしの文"),
    ("euc-jp", "EUC-JP", "仮名と漢字の行"),
    ("x-euc-jp", "EUC-JP", "別ラベル同符号化"),
    ("cseucpkdfmtjapanese", "EUC-JP", "最長の別名"),
    ("gbk", "GBK", "中文文本样例"),
    ("gb2312", "GBK", "简体标签折叠到GBK"),
    ("chinese", "GBK", "旧式标签"),
    ("csgb2312", "GBK", "又一个别名"),
    ("iso-ir-58", "GBK", "登记册名"),
    ("big5", "Big5", "繁體中文範例"),
    ("cn-big5", "Big5", "別名測試"),
    ("csbig5", "Big5", "舊標籤"),
    ("euc-kr", "x-windows-949", "한국어 본문 예시"),
    ("korean", "x-windows-949", "오래된 라벨"),
    ("ks_c_5601-1987", "x-windows-949", "표준 이름"),
    ("windows-949", "x-windows-949", "확장 라벨"))

  test("every WHATWG CJK alias normalizes and roundtrips its bytes " +
      "exactly through decodeBody") {
    val df = cases.map { case (label, jdk, text) =>
      (label, text, text.getBytes(java.nio.charset.Charset.forName(jdk)))
    }.toDF("label", "text", "bytes")
      .select(col("label"), col("text"),
        Warc.normalizeCharset(col("label")).as("ncs"),
        Warc.decodeBody(col("bytes"), col("label")).as("decoded"))
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.getString(3) == r.getString(1),
        s"label ${r.getString(0)} did not roundtrip")
    }
    val norms = rows.map(r => r.getString(0) -> r.getString(2)).toMap
    assert(norms("sjis") == "shift_jis" && norms("ms_kanji") == "shift_jis")
    assert(norms("cseucpkdfmtjapanese") == "euc-jp")
    assert(norms("gb2312") == "gbk" && norms("chinese") == "gbk")
    assert(norms("cn-big5") == "big5")
    assert(norms("korean") == "euc-kr" && norms("windows-949") == "euc-kr")
  }

  test("superset routing is live: NEC extension ① under a plain " +
      "shift_jis label decodes via windows-31j (a strict Shift_JIS " +
      "decoder has no mapping for it)") {
    // U+2460 CIRCLED DIGIT ONE: NEC row 13 — present in windows-31j,
    // absent from plain JIS X 0208. Real shift_jis-labeled pages carry
    // these; browsers decode them through the superset.
    val txt = "丸数字①入り"
    val bytes = txt.getBytes(java.nio.charset.Charset.forName("windows-31j"))
    val got = Seq(1).toDF("i")
      .select(Warc.decodeBody(
        lit(bytes), lit("shift_jis")).as("d")).head().getString(0)
    assert(got == txt)
    // and the EUC-KR family routes through windows-949: a syllable
    // outside KS X 1001's 2350 precomposed set still decodes
    val kr = "뷁뷂" // UHC-only syllables
    val krBytes = kr.getBytes(java.nio.charset.Charset.forName("x-windows-949"))
    val gotKr = Seq(1).toDF("i")
      .select(Warc.decodeBody(lit(krBytes), lit("euc-kr")).as("d"))
      .head().getString(0)
    assert(gotKr == kr)
  }

  test("an UNMAPPED label falls to lenient UTF-8 and the mojibake is " +
      "VISIBLE (U+FFFD), never a silent pass") {
    val txt = "日本語テキスト"
    val bytes = txt.getBytes(java.nio.charset.Charset.forName("windows-31j"))
    val got = Seq(1).toDF("i")
      .select(Warc.decodeBody(lit(bytes), lit("x-mystery-sjis")).as("d"))
      .head().getString(0)
    assert(got != txt, "mojibake silently passed as clean text")
    assert(got.contains('�'),
      "unmapped-label decode must surface replacement characters")
  }

  test("cross-codec decode FAILS the clean match (the per-class " +
      "branch is load-bearing)") {
    val txt = "漢字テスト文"
    val sjisBytes = txt.getBytes(java.nio.charset.Charset.forName("windows-31j"))
    // same bytes decoded under a DIFFERENT (normalized) CJK label:
    // must not equal the original text
    val got = Seq(1).toDF("i")
      .select(Warc.decodeBody(lit(sjisBytes), lit("gbk")).as("d"))
      .head().getString(0)
    assert(got != txt)
  }
}
