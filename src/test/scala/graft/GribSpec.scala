package graft

import java.nio.file.{Files, Path}
import graft.core.{DocRow, Span, Status}
import graft.corpus.Corpus
import graft.engine.Extractor
import org.scalatest.funsuite.AnyFunSuite

/** GRIB 1/2 extraction vs the reference's real scientific-module
  * fixtures; assertions mirror grib/GribParserTest (dimensions: /
  * variables: body markers) plus the metadata our native walk surfaces.
  */
class GribSpec extends AnyFunSuite {

  private val docs = Path.of("/root/reference/tika-parsers/" +
    "tika-parsers-extended/tika-parser-scientific-module/" +
    "src/test/resources/test-documents")

  private def extract(b: Array[Byte], name: String = "t.grb"): graft.core.ExtractedDoc =
    Extractor.extract(DocRow(name, Seq(Span("bytes", Corpus.b64(b), null, 0))))

  private def text(d: graft.core.ExtractedDoc): String =
    d.spans.filter(_.kind == Span.KindText).map(_.text).mkString("\n")

  test("gdas1 grib2: global metadata + body markers (GribParserTest.testParseGlobalMetadata)") {
    val p = docs.resolve("gdas1.forecmwf.2014062612.grib2")
    org.scalatest.Assertions.assume(Files.isRegularFile(p), "fixtures absent")
    val d = extract(Files.readAllBytes(p), "gdas1.forecmwf.2014062612.grib2")
    assert(d.mime == "application/x-grib", d.mime)
    assert(d.status == Status.ParseSuccess, d.status)
    assert(d.meta.get("grib:edition").exists(_.contains("2")))
    assert(d.meta.get("grib:originating_centre").exists(_.exists(_.contains("NCEP"))))
    assert(d.meta.get("grib:reference_time").exists(_.contains("2014-06-26T12:00:00Z")))
    val t = text(d)
    assert(t.contains("dimensions:"), t.take(200))
    assert(t.contains("variables:"))
    assert(t.contains("Ni = 360"))
    assert(t.contains("Nj = 181"))
  }

  test("GLDAS grib1: centre/time/grid from PDS+GDS") {
    val p = docs.resolve("GLDAS_CLM10SUBP_3H.A19790202.0000.001.grb")
    org.scalatest.Assertions.assume(Files.isRegularFile(p), "fixtures absent")
    val d = extract(Files.readAllBytes(p), "GLDAS_CLM10SUBP_3H.A19790202.0000.001.grb")
    assert(d.status == Status.ParseSuccess, d.status)
    assert(d.meta.get("grib:edition").exists(_.contains("1")))
    assert(d.meta.get("grib:reference_time").exists(_.exists(_.startsWith("1979-02-0"))))
    val t = text(d)
    assert(t.contains("Ni = 360"), t.take(300))
    assert(t.contains("Nj = 150"))
    assert(t.contains("variables:"))
    assert(t.contains("parameter "))
    // multi-message file: every message counted
    assert(d.meta.get("grib:message_count").exists(_.head.toInt > 1))
  }

  test("malformed: truncated / section bombs recorded, not crashed") {
    // truncated: indicator only
    val d1 = extract("GRIB".getBytes ++ Array[Byte](0, 0, 32, 2))
    assert(d1.status == Status.ParseException, d1.status)
    // grib2 message whose declared length exceeds the file
    val big = "GRIB".getBytes ++ Array[Byte](0, 0, 0, 2,
      0, 0, 0, 0, 0, 0x10, 0, 0) ++ new Array[Byte](32)
    val d2 = extract(big)
    assert(d2.status == Status.ParseException, d2.status)
    // grib2 section with length < 5 (would loop forever unguarded)
    val hdr = "GRIB".getBytes ++ Array[Byte](0, 0, 0, 2, 0, 0, 0, 0, 0, 0, 0, 28)
    val badSect = hdr ++ Array[Byte](0, 0, 0, 2, 1) ++ new Array[Byte](7)
    val d3 = extract(badSect)
    assert(d3.status == Status.ParseException, d3.status)
  }
}
