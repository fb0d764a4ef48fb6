package graft

import java.nio.file.{Files, Path}
import graft.core.{DocRow, Span, Status}
import graft.corpus.Corpus
import graft.engine.Extractor
import org.scalatest.funsuite.AnyFunSuite

/** PPTX slide-master/layout text, slide comments, chart and diagram
  * data; DOCX end-of-document chart/diagram dump — the round-4 quiet-gap
  * tranche EmptyAudit surfaced (clean parses with zero text).
  *
  * Reference: SXSLFPowerPointExtractorDecorator.buildXHTML (masters
  * placeholder-skipped via PlaceHolderSkipper, comments through
  * XSLFCommentsHandler with commentAuthors.xml names, diagram/chart via
  * OOXMLWordAndPowerPointTextHandler chart mode) and
  * SXWPFWordExtractorDecorator:300-306 (diagram/chart dump);
  * expectations from OOXMLPptxSAXTest / OOXMLDocxSAXTest.
  */
class PptxMasterChartSpec extends AnyFunSuite {

  private val docs = Path.of("/root/reference/tika-parsers/" +
    "tika-parsers-standard/tika-parsers-standard-modules/" +
    "tika-parser-microsoft-module/src/test/resources/test-documents")

  private def text(name: String): String = {
    org.scalatest.Assertions.assume(
      Files.isRegularFile(docs.resolve(name)), "reference fixtures not present")
    val b = Files.readAllBytes(docs.resolve(name))
    val d = Extractor.extract(
      DocRow("n", Seq(Span("bytes", Corpus.b64(b), null, 0))))
    assert(d.status == Status.ParseSuccess, d.status)
    d.spans.filter(_.kind == Span.KindText).map(_.text).mkString
  }

  test("slide-master text extracted by default (includeSlideMasterContent)") {
    assert(text("testPPT_masterText.pptx")
      .contains("Text that I added to the master slide"))
    assert(text("testPPT_masterText2.pptx")
      .contains("Text that I added to the master slide"))
    assert(text("testPPT_masterFooter.pptx").contains("Master footer is here"))
  }

  test("master/layout placeholder boilerplate is skipped") {
    // PlaceHolderSkipper: layout/master <p:ph> shapes carry the
    // "Click to edit Master title style" templates — never body text
    assert(!text("testPPT_masterText.pptx").contains("Click to edit"))
  }

  test("pptx slide comments carry author name and initials") {
    val t = text("testPPT_comment.pptx")
    assert(t.contains("Allison, Timothy B. (ATB)"), t.take(300))
    assert(t.contains("tps deck"))
  }

  test("pptx chart data: series names and cached category values") {
    val t = text("testPPT_charts.pptx")
    assert(t.contains("peach"))
    assert(t.contains("March\tApril"))
  }

  test("pptx diagram (SmartArt) text") {
    assert(text("testPPT_diagramData.pptx").contains("President"))
  }

  test("docx chart + diagram dump after the main story") {
    val t = text("testWORD_charts.docx")
    assert(t.contains("peach"))
    assert(t.contains("March\tApril"))
    assert(text("testWORD_diagramData.docx").contains("From here"))
  }
}
