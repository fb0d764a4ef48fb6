package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.mime.{EncodingDetector, MbCharsets}

/** Round-3: East-Asian/Cyrillic legacy charset recognition (the icu4j
  * recognizer subset — reference tika-encoding-detectors). Real
  * sentences encoded through the JDK codecs must decode back losslessly
  * with NO BOM and NO declared charset.
  */
class MbCharsetSpec extends AnyFunSuite {

  private def enc(s: String, cs: String): Array[Byte] =
    s.getBytes(java.nio.charset.Charset.forName(cs))

  private val ja = "今日は天気がとても良いので公園へ散歩に行きました。日本語の文章です。"
  private val zhTrad = "這是一個使用繁體中文書寫的測試文件，其中包含許多常見的漢字。"
  private val zhSimp = "这是一个使用简体中文书写的测试文件，其中包含许多常见的汉字。"
  private val ru = "собака и кошка сегодня гуляют возле дома потому что погода очень хорошая"

  test("Shift_JIS round-trips through statistical detection") {
    val bytes = enc(ja, "Shift_JIS")
    assert(EncodingDetector.decode(bytes) == ja)
  }

  test("EUC-JP round-trips") {
    val bytes = enc(ja, "EUC-JP")
    assert(EncodingDetector.decode(bytes) == ja)
  }

  test("ISO-2022-JP recognized by escape sequences") {
    val bytes = enc(ja, "ISO-2022-JP")
    assert(EncodingDetector.decode(bytes) == ja)
  }

  test("Big5 round-trips") {
    val bytes = enc(zhTrad, "Big5")
    assert(EncodingDetector.decode(bytes) == zhTrad)
  }

  test("GBK round-trips") {
    val bytes = enc(zhSimp, "GBK")
    assert(EncodingDetector.decode(bytes) == zhSimp)
  }

  test("EUC-KR round-trips (NFC-normalized profile codes)") {
    val ko = "그리고 그것은 우리 모두에게 중요한 문제입니다. 한국어 텍스트 감지 테스트."
    assert(EncodingDetector.decode(enc(ko, "EUC-KR")) == ko)
  }

  test("cp866 (DOS Cyrillic) distinguished from KOI8-R and cp1251") {
    val out = EncodingDetector.decode(enc(ru, "IBM866"))
    assert(out == ru)
  }

  test("KOI8-R and windows-1251 distinguished statistically") {
    assert(EncodingDetector.decode(enc(ru, "KOI8-R")) == ru)
    assert(EncodingDetector.decode(enc(ru, "windows-1251")) == ru)
  }

  test("existing fallbacks unregressed: utf-8, cp1252 C1, latin-1, utf-16") {
    val utf8 = "héllo wörld — naïve café".getBytes("UTF-8")
    assert(EncodingDetector.decode(utf8) == "héllo wörld — naïve café")
    val smart = "a “quoted” word".getBytes("windows-1252")
    assert(EncodingDetector.decode(smart) == "a “quoted” word")
    val latin = "plain accented café text".getBytes("ISO-8859-1")
    assert(EncodingDetector.decode(latin) == "plain accented café text")
    val utf16 = "bomless utf sixteen text here".getBytes("UTF-16LE")
    assert(EncodingDetector.decode(utf16) == "bomless utf sixteen text here")
  }

  test("mixed ascii + a few C1 bytes does NOT misdetect as CJK") {
    // smart quotes in an otherwise-ascii paragraph: the hit-rate floor
    // keeps the mb recognizers quiet; cp1252 applies
    val text = "mostly ascii text with “just two” smart quotes " +
      "and a lot of ordinary words to dilute the high bytes"
    val bytes = text.getBytes("windows-1252")
    assert(EncodingDetector.decode(bytes) == text)
  }

  test("iso-2022-jp scan ignores plain ESC without the $ sequence") {
    assert(!MbCharsets.looksIso2022Jp("a\u001b[31mred\u001b[0m".getBytes("ASCII"), 20))
  }
}
