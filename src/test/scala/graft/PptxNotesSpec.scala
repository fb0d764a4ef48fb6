package graft

import java.nio.file.{Files, Path}
import graft.core.{DocRow, Span, Status}
import graft.corpus.Corpus
import graft.engine.Extractor
import org.scalatest.funsuite.AnyFunSuite

/** PPTX speaker-notes extraction — the reference's
  * OfficeParserConfig.includeSlideNotes defaults true, so notes-slide
  * text (incl. its header/footer placeholders) follows each slide.
  */
class PptxNotesSpec extends AnyFunSuite {

  private val docs = Path.of("/root/reference/tika-parsers/" +
    "tika-parsers-standard/tika-parsers-standard-modules/" +
    "tika-parser-microsoft-module/src/test/resources/test-documents")

  test("testPPT_various.pptx: notes-slide text present") {
    org.scalatest.Assertions.assume(
      Files.isRegularFile(docs.resolve("testPPT_various.pptx")),
      "reference fixtures not present")
    val b = Files.readAllBytes(docs.resolve("testPPT_various.pptx"))
    val d = Extractor.extract(
      DocRow("n", Seq(Span("bytes", Corpus.b64(b), null, 0))))
    assert(d.status == Status.ParseSuccess, d.status)
    val t = d.spans.filter(_.kind == Span.KindText).map(_.text).mkString
    assert(t.contains("This is the footer text."), t.takeRight(400))
  }
}
