package graft

import java.nio.file.{Files, Path}
import graft.core.{DocRow, Span, Status}
import graft.corpus.Corpus
import graft.engine.Extractor
import org.scalatest.funsuite.AnyFunSuite

/** NetCDF classic header extraction vs the reference's real fixture;
  * assertions mirror netcdf/NetCDFParserTest.testParseGlobalMetadata —
  * CF global attributes in metadata, dimension/variable listing in the
  * body text.
  */
class NetcdfSpec extends AnyFunSuite {

  private val docs = Path.of("/root/reference/tika-parsers/" +
    "tika-parsers-extended/tika-parser-scientific-module/" +
    "src/test/resources/test-documents")

  private def extract(name: String): graft.core.ExtractedDoc = {
    org.scalatest.Assertions.assume(Files.isRegularFile(docs.resolve(name)),
      "reference fixtures not present")
    val b = Files.readAllBytes(docs.resolve(name))
    Extractor.extract(DocRow(name, Seq(Span("bytes", Corpus.b64(b), null, 0))))
  }

  private def text(d: graft.core.ExtractedDoc): String =
    d.spans.filter(_.kind == Span.KindText).map(_.text).mkString("\n")

  test("sresa1b .nc: CF global metadata (NetCDFParserTest)") {
    val d = extract("sresa1b_ncar_ccsm3_0_run1_200001.nc")
    assert(d.mime == "application/x-netcdf", d.mime)
    assert(d.status == Status.ParseSuccess, d.status)
    assert(d.meta.get("dc:title").exists(_.contains("model output prepared for IPCC AR4")))
    assert(d.meta.get("contact").exists(_.contains("ccsm@ucar.edu")))
    assert(d.meta.get("project_id").exists(_.contains("IPCC Fourth Assessment")))
    assert(d.meta.get("Conventions").exists(_.contains("CF-1.0")))
    assert(d.meta.get("realization").exists(_.contains("1")))
    assert(d.meta.get("experiment_id")
      .exists(_.contains("720 ppm stabilization experiment (SRESA1B)")))
    assert(d.meta.get("netcdf:File-Type-Description").exists(_.contains("NetCDF-3/CDM")))
  }

  test("sresa1b .nc: dimension + variable listing (NetCDFParserTest)") {
    val t = text(extract("sresa1b_ncar_ccsm3_0_run1_200001.nc"))
    assert(t.contains("long_name = \"Surface area\""), t.take(400))
    assert(t.contains("float area(lat=128, lon=256)"))
    assert(t.contains("float lat(lat=128)"))
    assert(t.contains("double lat_bnds(lat=128, bnds=2)"))
    assert(t.contains("double lon_bnds(lon=256, bnds=2)"))
    assert(t.contains("lat = 128"))
    assert(t.contains("lon = 256"))
  }

  test("malformed: truncated header and header bombs recorded, not crashed") {
    val good = Files.readAllBytes(
      docs.resolve("sresa1b_ncar_ccsm3_0_run1_200001.nc"))
    org.scalatest.Assertions.assume(good.nonEmpty)
    // truncate mid-header
    val d1 = extract0(good.take(40))
    assert(d1.status == Status.ParseException, d1.status)
    // absurd gatt count: 0x7fffffff attrs in a 64-byte file
    val bomb = good.take(24) ++
      Array[Byte](0, 0, 0, 0x0c, 0x7f, -1, -1, -1) ++ new Array[Byte](8)
    val d2 = extract0(bomb)
    assert(d2.status == Status.ParseException, d2.status)
  }

  private def extract0(b: Array[Byte]): graft.core.ExtractedDoc =
    Extractor.extract(DocRow("t.nc", Seq(Span("bytes", Corpus.b64(b), null, 0))))
}
