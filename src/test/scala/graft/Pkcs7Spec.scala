package graft

import java.nio.file.{Files, Path}
import graft.core.{DocRow, Span, Status}
import graft.corpus.Corpus
import graft.engine.Extractor
import graft.crypto.Pkcs7Extractor
import org.scalatest.funsuite.AnyFunSuite

/** CMS/PKCS#7 unwrapping vs the reference's real BouncyCastle-produced
  * fixtures (definite-length DER and indefinite-length BER variants,
  * timestamped-data, enveloped, detached).
  */
class Pkcs7Spec extends AnyFunSuite {

  private val docs = Path.of("/root/reference/tika-parsers/" +
    "tika-parsers-standard/tika-parsers-standard-modules/" +
    "tika-parser-crypto-module/src/test/resources/test-documents")

  private def fixture(name: String): Array[Byte] = {
    org.scalatest.Assertions.assume(Files.isRegularFile(docs.resolve(name)),
      "reference fixtures not present")
    Files.readAllBytes(docs.resolve(name))
  }

  test("signed xml unwraps and recurses (indefinite-length BER)") {
    val out = Extractor.extract(DocRow("p7m",
      Seq(Span("bytes", Corpus.b64(fixture("test.xml.p7m")), null, 0))))
    assert(out.mime == graft.mime.MimeDb.Pkcs7Mime)
    assert(out.status == Status.ParseSuccess)
    assert(out.meta("cms:content-type") == Seq("1.2.840.113549.1.7.2"))
    // the wrapped test.xml content extracts through recursion
    assert(out.spans.exists(s => s.kind == Span.KindText && s.text.nonEmpty))
  }

  test("definite- and indefinite-length signed data both unwrap") {
    val defU = Pkcs7Extractor.unwrap(fixture("testPKCS7_signed_data_def.p7m"))
    val indU = Pkcs7Extractor.unwrap(fixture("testPKCS7_signed_data_ind.p7m"))
    assert(defU.content.nonEmpty && indU.content.nonEmpty)
  }

  test("timestamped-data (.tsd) yields its wrapped payload") {
    val u = Pkcs7Extractor.unwrap(fixture("Test1.txt.tsd"))
    assert(new String(u.content, "US-ASCII").contains("This is"))
  }

  test("enveloped (encrypted) cms records a failure; detached is metadata-only") {
    intercept[Pkcs7Extractor.Pkcs7Malformed] {
      Pkcs7Extractor.unwrap(fixture("testPKCS7_enveloped_def.p7m"))
    }
    val out = Extractor.extract(DocRow("env",
      Seq(Span("bytes", Corpus.b64(fixture("testPKCS7_enveloped_def.p7m")), null, 0))))
    assert(out.status == Status.ParseException ||
      out.status == Status.UnsupportedType)
  }
}
