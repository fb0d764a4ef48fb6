package graft

import java.nio.file.{Files, Path}
import graft.core.{DocRow, Span, Status}
import graft.corpus.Corpus
import graft.engine.Extractor
import org.scalatest.funsuite.AnyFunSuite

/** MSOffice owner/lock temp-file parsing (MSOwnerFileParserTest). */
class MsOwnerSpec extends AnyFunSuite {

  private val docs = Path.of("/root/reference/tika-parsers/" +
    "tika-parsers-standard/tika-parsers-standard-modules/" +
    "tika-parser-microsoft-module/src/test/resources/test-documents")

  test("testMSOwnerFile: magic detection + modifier name") {
    org.scalatest.Assertions.assume(
      Files.isRegularFile(docs.resolve("testMSOwnerFile")),
      "reference fixtures not present")
    val b = Files.readAllBytes(docs.resolve("testMSOwnerFile"))
    val d = Extractor.extract(
      DocRow("testMSOwnerFile", Seq(Span("bytes", Corpus.b64(b), null, 0))))
    assert(d.mime == graft.mime.MimeDb.MsOwner)
    assert(d.status == Status.ParseSuccess)
    assert(d.meta.get("dc:modifier").exists(_.contains("heidi")))
  }

  test("ascii/unicode length disagreement is a parse error") {
    val bad = new Array[Byte](64)
    bad(0) = 5; "heidi".getBytes.copyToArray(bad, 1)
    bad(54) = 9 // unicode length disagrees
    val m = new graft.engine.MetaSink()
    intercept[graft.ole2.OwnerFileExtractor.OwnerMalformed] {
      graft.ole2.OwnerFileExtractor.extract(bad, m)
    }
  }

  test("owner file is metadata-only: no text spans") {
    org.scalatest.Assertions.assume(
      Files.isRegularFile(docs.resolve("testMSOwnerFile")),
      "reference fixtures not present")
    val b = Files.readAllBytes(docs.resolve("testMSOwnerFile"))
    val d = Extractor.extract(
      DocRow("testMSOwnerFile", Seq(Span("bytes", Corpus.b64(b), null, 0))))
    assert(d.spans.forall(_.kind != Span.KindText))
  }
}
