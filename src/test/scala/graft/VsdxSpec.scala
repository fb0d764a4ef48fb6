package graft

import java.nio.file.{Files, Path}
import graft.core.{DocRow, Span, Status}
import graft.corpus.Corpus
import graft.engine.Extractor
import org.scalatest.funsuite.AnyFunSuite

/** Visio OOXML extraction vs the reference's real fixtures
  * (VSDXParserTest expectations).
  */
class VsdxSpec extends AnyFunSuite {

  private val docs = Path.of("/root/reference/tika-parsers/" +
    "tika-parsers-standard/tika-parsers-standard-modules/" +
    "tika-parser-microsoft-module/src/test/resources/test-documents")

  private def extract(name: String): graft.core.ExtractedDoc = {
    org.scalatest.Assertions.assume(Files.isRegularFile(docs.resolve(name)),
      "reference fixtures not present")
    val b = Files.readAllBytes(docs.resolve(name))
    Extractor.extract(DocRow(name, Seq(Span("bytes", Corpus.b64(b), null, 0))))
  }

  private def text(d: graft.core.ExtractedDoc): String =
    d.spans.filter(_.kind == Span.KindText).map(_.text).mkString("\n")

  test("testVISIO.vsdx: shape text as paragraphs") {
    val d = extract("testVISIO.vsdx")
    assert(d.mime == "application/vnd.ms-visio.drawing")
    assert(d.status == Status.ParseSuccess)
    val t = text(d)
    // VSDXParserTest.testBasic
    assert(t.contains("This is a test."))
    assert(t.contains("Nothing fancy."))
  }

  test("testVISIO_text.vsdx: all page texts in order") {
    val t = text(extract("testVISIO_text.vsdx"))
    // VSDXParserTest.testVisioTextExtraction
    assert(t.contains("Text here"))
    assert(t.contains("Text there"))
    assert(t.contains("Text, text, everywhere!"))
    assert(t.contains("Router here"))
  }

  test("testVISIO_60489.vsdx: multi-page document") {
    val t = text(extract("testVISIO_60489.vsdx"))
    // VSDXParserTest.testTika60489
    assert(t.contains("HousingConnections.ca"))
    assert(t.contains("Content Authors"))
    assert(t.contains("Submit Application"))
  }

  test("legacy .vsd detects as application/vnd.visio (root-entry name)") {
    // text extraction stays excluded (the reference reads VSD through
    // POI's external HDGF module, not in-tree); detection must work
    val d = extract("testVISIO.vsd")
    assert(d.mime == "application/vnd.visio")
  }

  test("macro-enabled and template variants detect as their subtypes") {
    val m = extract("testVISIO.vsdm")
    assert(m.mime == "application/vnd.ms-visio.drawing.macroEnabled.12")
    assert(m.status == Status.ParseSuccess)
    val tpl = extract("testVISIO.vstx")
    assert(tpl.mime == "application/vnd.ms-visio.template")
    assert(tpl.status == Status.ParseSuccess)
  }
}
