package graft

import java.nio.file.{Files, Path}
import graft.core.{DocRow, Span, Status}
import graft.corpus.Corpus
import graft.engine.Extractor
import org.scalatest.funsuite.AnyFunSuite

/** TNEF / winmail.dat vs the reference's real fixture; assertions mirror
  * microsoft/TNEFParserTest.java (subject metadata, the six embedded
  * children, the German RTF body text).
  */
class TnefSpec extends AnyFunSuite {

  private val docs = Path.of("/root/reference/tika-parsers/" +
    "tika-parsers-standard/tika-parsers-standard-modules/" +
    "tika-parser-microsoft-module/src/test/resources/test-documents")

  private def doc(): graft.core.ExtractedDoc = {
    org.scalatest.Assertions.assume(
      Files.isRegularFile(docs.resolve("testWINMAIL.dat")),
      "reference fixtures not present")
    val b = Files.readAllBytes(docs.resolve("testWINMAIL.dat"))
    Extractor.extract(DocRow("testWINMAIL.dat",
      Seq(Span("bytes", Corpus.b64(b), null, 0))),
      Extractor.DefaultConfig.copy(maxEmbedded = 50))
  }

  test("winmail.dat: subject, rtf body, six named attachments") {
    val d = doc()
    assert(d.mime == "application/vnd.ms-tnef", d.mime)
    assert(d.status == Status.ParseSuccess, d.status)
    assert(d.meta.get("dc:title").exists(_.contains("This is a test message")),
      d.meta.get("dc:title"))
    val embeddedNames = d.meta.getOrElse("embedded:path", Seq.empty)
    for (n <- Seq("message.rtf", "quick.doc", "quick.html", "quick.pdf",
        "quick.txt", "quick.xml"))
      assert(embeddedNames.exists(_.endsWith(n)), s"$n missing in $embeddedNames")
    // the compressed-RTF body decodes (German pangram from the fixture)
    val t = d.spans.filter(_.kind == Span.KindText).map(_.text).mkString("\n")
    assert(t.contains("Der schnelle braune"), t.take(400))
  }
}
