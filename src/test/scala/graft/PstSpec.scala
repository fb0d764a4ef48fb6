package graft

import java.nio.file.{Files, Path}
import graft.core.{DocRow, Span, Status}
import graft.corpus.Corpus
import graft.engine.Extractor
import org.scalatest.funsuite.AnyFunSuite

/** MS-PST extraction vs the reference's real fixtures. Assertions mirror
  * pst/OutlookPSTParserTest.java: folder names, message subjects/senders,
  * the nested message-in-message docx attachment, and the
  * winmail.dat/TNEF message body fixture. These tests double as the
  * known-plaintext validation of the permutative-encoding decode table
  * (every expected string below only appears if the byte substitution is
  * exact — the fixtures exercise all 256 encoded byte values).
  */
class PstSpec extends AnyFunSuite {

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

  test("testPST.pst: folders, messages, metadata, nested docx attachment") {
    val d = extract("testPST.pst")
    assert(d.mime == graft.mime.MimeDb.Pst)
    assert(d.status == Status.ParseSuccess)
    val t = text(d)
    // OutlookPSTParserTest.testAccuracyOfBasicAttributes expectations
    assert(t.contains("Re: Feature Generators"))
    assert(t.contains("Racine (pour la recherche)"))
    assert(t.contains("Gary Murphy commented on TIKA-1250:"))
    // the docx attachment recursed through the OOXML chain
    assert(t.contains("This is a docx attachment."))
    // reference metadataList.size == 10: container + 7 top-level
    // messages + the nested "First email.msg" + its attachment.docx
    assert(d.meta("pst:message_count").head.toInt == 7)
    val flat = d.meta.map { case (k, v) => s"$k=${v.mkString("|")}" }
      .mkString("\n")
    // per-message scoped email metadata (synthesized RFC 822 children)
    assert(flat.contains("Jörn Kottmann"))
    assert(flat.contains("kottmann@gmail.com"))
    assert(flat.contains("couchbase@couchbase.com"))
    assert(flat.contains("Re: Feature Generators"))
  }

  test("testPST_variousBodyTypes.pst: winmail.dat TNEF recursion") {
    val d = extract("testPST_variousBodyTypes.pst")
    assert(d.status == Status.ParseSuccess)
    val t = text(d)
    // testOverrideDetector fixture: "FW: original email" with winmail.dat
    assert(t.contains("original email"))
    assert(d.meta("pst:message_count").head.toInt >= 1)
  }

  test("decode table permutation invariant holds at object init") {
    // the object initializer `require`s a 256-value byte permutation;
    // touching the object would have thrown otherwise
    assert(graft.pst.PstExtractor.getClass.getSimpleName.nonEmpty)
  }

  test("truncated and ANSI headers are rejected cleanly") {
    val p = docs.resolve("testPST.pst")
    org.scalatest.Assertions.assume(Files.isRegularFile(p))
    val b = Files.readAllBytes(p)
    // truncated: parse_exception status, no crash
    val trunc = Extractor.extract(DocRow("t.pst",
      Seq(Span("bytes", Corpus.b64(java.util.Arrays.copyOf(b, 600)), null, 0))))
    assert(trunc.status != Status.ParseSuccess)
    // ANSI version marker
    val ansi = java.util.Arrays.copyOf(b, 1024)
    ansi(10) = 14; ansi(11) = 0
    val a = Extractor.extract(DocRow("a.pst",
      Seq(Span("bytes", Corpus.b64(ansi), null, 0))))
    assert(a.status != Status.ParseSuccess)
  }
}
