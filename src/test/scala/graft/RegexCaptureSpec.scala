package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{DocRow, Span}
import graft.corpus.Corpus
import graft.engine.Extractor

/** RegexCaptureParser parity: configured patterns replace the
  * text/plain parse; RegexCaptureParserTest.testBasic is mirrored
  * verbatim plus the multi-value/dedup/match-map/writeContent
  * behaviors the reference implementation defines.
  */
class RegexCaptureSpec extends AnyFunSuite {

  private def run(text: String, cfg: Extractor.Config) =
    Extractor.extract(DocRow("doc.txt",
      Seq(Span("bytes", Corpus.b64(text.getBytes("UTF-8")), null, 0))), cfg)

  private def body(d: graft.core.ExtractedDoc): String =
    d.spans.filter(_.kind == graft.core.Span.KindText).map(_.text).mkString

  test("reference testBasic: title capture") {
    val text = "Something\n" +
      "Title: the quick brown fox\n" +
      "Author: jumped over\n" +
      "Created: 10/20/2024"
    val d = run(text, Extractor.DefaultConfig.copy(
      regexCaptures = Seq("title" -> "^Title: ([^\r\n]+)")))
    assert(d.meta.getOrElse("title", Seq.empty) === Seq("the quick brown fox"))
    assert(body(d).isEmpty, "writeContent defaults off")
  }

  test("multi-valued captures dedup in first-seen order") {
    val text = "k: b\nk: a\nk: b\nk: c\n"
    val d = run(text, Extractor.DefaultConfig.copy(
      regexCaptures = Seq("key" -> "^k: (.+)$")))
    assert(d.meta.getOrElse("key", Seq.empty) === Seq("b", "a", "c"))
  }

  test("match map sets true; several patterns coexist") {
    val text = "INFO boot ok\nWARN disk low\nTitle: x\n"
    val d = run(text, Extractor.DefaultConfig.copy(
      regexCaptures = Seq("title" -> "^Title: (.+)$"),
      regexMatches = Seq("has_warn" -> "^WARN ", "has_error" -> "^ERROR ")))
    assert(d.meta.getOrElse("has_warn", Seq.empty) === Seq("true"))
    assert(d.meta.get("has_error").isEmpty)
    assert(d.meta.getOrElse("title", Seq.empty) === Seq("x"))
  }

  test("writeContent emits line characters without terminators") {
    val text = "ab\ncd\r\nef"
    val d = run(text, Extractor.DefaultConfig.copy(
      regexCaptures = Seq("x" -> "(zzz)"), regexWriteContent = true))
    assert(body(d) === "abcdef")
  }

  test("unconfigured extraction is unchanged (csv/text route)") {
    val d = run("plain text line\n", Extractor.DefaultConfig)
    assert(body(d).contains("plain text line"))
  }
}
