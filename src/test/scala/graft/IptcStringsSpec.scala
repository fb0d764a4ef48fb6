package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.ISO_8859_1
import graft.core.{DocRow, Span, Status}
import graft.corpus.Corpus
import graft.engine.Extractor
import graft.textparse.{IptcAnpaExtractor, StringsExtractor}
import graft.engine.{MetaSink, SpanSink}

/** Round-3 breadth tail: IPTC ANPA-1312 newswire + the opt-in strings
  * fallback (news-module IptcAnpaParser / code-module StringsParser).
  */
class IptcStringsSpec extends AnyFunSuite {

  private def anpaFixture: Array[Byte] = {
    val sb = new StringBuilder
    sb.append("\u0016\u0016\u0001")            // SYN SYN SOH
    sb.append("r a0123 bc-wire-story 09-28 0451\r\n")
    sb.append("\u0002")                        // STX
    sb.append("^bc-wire-story<\r\n")           // heading/slug
    sb.append("^Major Event Shakes Market<\r\n") // title
    sb.append("^By JANE REPORTER<\r\n")        // byline
    sb.append("The market moved sharply today, traders said.\r\n")
    sb.append("A second paragraph follows the first one.< \r\n")
    sb.append("\u0003")                        // ETX
    sb.append("\r\n")
    sb.toString.getBytes(ISO_8859_1)
  }

  test("anpa magic detects SYN SYN SOH") {
    assert(graft.mime.MimeRegistry.detect(anpaFixture, None) ==
      "text/vnd.iptc.anpa")
  }

  test("anpa parse: heading/title/byline metadata + body text") {
    val sink = new SpanSink(); val meta = new MetaSink
    IptcAnpaExtractor.extract(anpaFixture, sink, meta)
    val m = meta.result()
    assert(m("anpa:service") == Seq("r"))
    assert(m("anpa:category") == Seq("a0123"))
    assert(m("anpa:heading") == Seq("bc-wire-story"))
    assert(m("dc:title") == Seq("Major Event Shakes Market"))
    assert(m("dc:creator") == Seq("JANE REPORTER"))
    val text = sink.result().map(_.text).mkString("\n")
    assert(text.contains("The market moved sharply today"))
    assert(text.contains("second paragraph"))
    assert(!text.contains("<"))
  }

  test("anpa through the engine") {
    val out = Extractor.extract(DocRow("a1",
      Seq(Span("bytes", Corpus.b64(anpaFixture), null, 0))))
    assert(out.mime == "text/vnd.iptc.anpa")
    assert(out.status == Status.ParseSuccess)
    assert(out.meta("dc:title") == Seq("Major Event Shakes Market"))
  }

  test("strings extractor pulls printable runs from binaries") {
    val bytes = Array[Byte](0, 1, 2) ++ "embedded message".getBytes(ISO_8859_1) ++
      Array[Byte](0, -1) ++ "ok".getBytes(ISO_8859_1) ++ // below minLen
      Array[Byte](7) ++ "trailing run".getBytes(ISO_8859_1)
    val sink = new SpanSink()
    StringsExtractor.extract(bytes, sink)
    val lines = sink.result().map(_.text).mkString.split("\n").filter(_.nonEmpty)
    assert(lines.toSeq == Seq("embedded message", "trailing run"))
  }

  test("strings fallback is opt-in: junk stays unsupported by default") {
    val junkIdx = (0L until 1000L).find(i => Corpus.kindOf(i) == "junk").get
    val row = Corpus.row(junkIdx)
    val default = Extractor.extract(row)
    assert(default.status == Status.UnsupportedType)
    val salvaged = Extractor.extract(row,
      Extractor.DefaultConfig.copy(stringsFallback = true))
    assert(salvaged.status == Status.ParseSuccess ||
      salvaged.n_chars == 0 && salvaged.status == Status.UnsupportedType)
    assert(salvaged.meta.contains("strings:fallback") ||
      salvaged.status == Status.UnsupportedType)
  }
}
