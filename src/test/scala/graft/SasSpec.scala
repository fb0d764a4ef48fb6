package graft

import java.nio.file.{Files, Path}
import graft.core.{DocRow, Span, Status}
import graft.corpus.Corpus
import graft.engine.Extractor
import org.scalatest.funsuite.AnyFunSuite

/** SAS7BDAT extraction vs the reference's real fixtures; assertions
  * mirror sas/SAS7BDATParserTest (header metadata, column names, row
  * values, and parso-style date/datetime format rendering).
  */
class SasSpec extends AnyFunSuite {

  private val docs = Path.of("/root/reference/tika-parsers/" +
    "tika-parsers-standard/tika-parsers-standard-modules/" +
    "tika-parser-code-module/src/test/resources/test-documents")

  private def extract(b: Array[Byte], name: String = "t.sas7bdat"): graft.core.ExtractedDoc =
    Extractor.extract(DocRow(name, Seq(Span("bytes", Corpus.b64(b), null, 0))))

  private def text(d: graft.core.ExtractedDoc): String =
    d.spans.filter(_.kind == Span.KindText).map(_.text).mkString("\n")

  test("testSAS.sas7bdat: metadata + rows (SAS7BDATParserTest.testSimpleFile)") {
    val p = docs.resolve("testSAS.sas7bdat")
    org.scalatest.Assertions.assume(Files.isRegularFile(p), "fixtures absent")
    val d = extract(Files.readAllBytes(p))
    assert(d.mime == "application/x-sas-data", d.mime)
    assert(d.status == Status.ParseSuccess, d.status)
    assert(d.meta.get("dc:title").exists(_.contains("TESTING")), d.meta)
    assert(d.meta.get("dcterms:created").exists(_.contains("2017-01-30T07:31:47Z")),
      d.meta.get("dcterms:created"))
    assert(d.meta.get("meta:page-count").exists(_.contains("1")))
    assert(d.meta.get("database:column_count").exists(_.contains("2")))
    assert(d.meta.get("database:row_count").exists(_.contains("11")))
    assert(d.meta.get("content-encoding").exists(_.contains("windows-1252")))
    assert(d.meta.get("sas:server-type").exists(_.contains("W32_7PRO")))
    assert(d.meta.get("sas:release").exists(_.contains("9.0301M2")))
    assert(d.meta.get("architecture-bits").exists(_.contains("32")))
    assert(d.meta.get("endian").exists(_.contains("Little")))
    assert(d.meta.getOrElse("database:column_name", Nil) == Seq("recnum", "label"),
      d.meta.getOrElse("database:column_name", Nil))
    val t = text(d)
    assert(t.contains("TESTING"), t.take(200))
    assert(t.contains("3\tThis is row"), t)
    assert(t.contains("10\tThis is row"), t)
    assert(t.contains(" of "), t)
    assert(t.linesIterator.count(_.contains("This is row")) == 11, t)
  }

  test("test-columnar.sas7bdat: labels + date/datetime formats (testHTML2)") {
    val p = docs.resolve("test-columnar.sas7bdat")
    org.scalatest.Assertions.assume(Files.isRegularFile(p), "fixtures absent")
    val d = extract(Files.readAllBytes(p))
    assert(d.status == Status.ParseSuccess, d.status)
    assert(d.meta.get("dc:title").exists(_.contains("TESTING")))
    val names = d.meta.getOrElse("database:column_name", Nil)
    assert(names.contains("Record Number"), names)
    assert(names.contains("Square of the Record Number"), names)
    assert(names.contains("date"), names) // label empty -> column name
    val t = text(d)
    // DDMMYYD at the SAS epoch and DATETIME at +10s, parso rendering
    assert(t.contains("01-01-1960"), t.take(800))
    assert(t.contains("01JAN1960:00:00:10.00"), t.take(800))
  }

  test("hostile input: truncated/garbled sas never escapes the envelope") {
    val p = docs.resolve("testSAS.sas7bdat")
    org.scalatest.Assertions.assume(Files.isRegularFile(p), "fixtures absent")
    val good = Files.readAllBytes(p)
    Seq(1100, 2048, 5000).foreach { n =>
      val out = extract(java.util.Arrays.copyOf(good, n))
      assert(out.status != null)
    }
    val mangled = good.clone()
    var i = 1200
    while (i < mangled.length) { mangled(i) = (mangled(i) ^ 0x5a).toByte; i += 97 }
    assert(extract(mangled).status != null)
  }
}
