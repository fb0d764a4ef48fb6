package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}
import graft.core.{DocRow, Span, Status}
import graft.corpus.Corpus
import graft.engine.Extractor
import org.scalatest.funsuite.AnyFunSuite

/** ENVI image-header extraction vs the reference's real fixture;
  * assertions mirror envi/EnviHeaderParserTest — every header line as
  * body text (multi-line `{...}` values joined), `envi.*` metadata, and
  * the UTM map-info → lat/lon conversion.
  */
class EnviSpec extends AnyFunSuite {

  private val docs = Path.of("/root/reference/tika-parsers/" +
    "tika-parsers-extended/tika-parser-scientific-module/" +
    "src/test/resources/test-documents")

  private def extract(b: Array[Byte], name: String = "t.hdr"): graft.core.ExtractedDoc =
    Extractor.extract(DocRow(name, Seq(Span("bytes", Corpus.b64(b), null, 0))))

  private def text(d: graft.core.ExtractedDoc): String =
    d.spans.filter(_.kind == Span.KindText).map(_.text).mkString("\n")

  test("envi_test_header.hdr: body lines + metadata (EnviHeaderParserTest)") {
    val p = docs.resolve("envi_test_header.hdr")
    org.scalatest.Assertions.assume(Files.isRegularFile(p), "fixtures absent")
    val d = extract(Files.readAllBytes(p))
    assert(d.mime == "application/envi.hdr", d.mime)
    assert(d.status == Status.ParseSuccess, d.status)
    val t = text(d)
    assert(t.startsWith("ENVI"), t.take(40))
    assert(t.contains("samples = 2400"), t)
    assert(t.contains("lines   = 2400"), t)
    // single-line { } values stay intact on one line
    assert(t.contains("map info = {Sinusoidal, 1.5000, 1.5000, " +
      "-10007091.3643, 5559289.2856, 4.6331271653e+02, 4.6331271653e+02, " +
      ", units=Meters}"), t)
    assert(t.contains("projection info = {16, 6371007.2, 0.000000, 0.0, " +
      "0.0, Sinusoidal, units=Meters}"), t)
    // the two-line description joins with no separator
    // (parseMultiLineFieldValue)
    assert(t.contains("description = {  GEO-TIFF File Imported into ENVI"), t)
    assert(d.meta.get("envi.samples").exists(_.contains("2400")), d.meta)
    assert(d.meta.get("envi.file.type").exists(_.contains("ENVI Standard")), d.meta)
    // the ~500-char coordinate-system line skips metadata (300-char cap)
    assert(!d.meta.keys.exists(_.contains("coordinate")), d.meta.keys)
  }

  test("UTM map info converts to WGS-84 lat/lon") {
    // zone 31N, easting 500000 (central meridian), northing 0 → (0, 3)
    val hdr = ("ENVI\n" +
      "samples = 10\n" +
      "map info = {UTM, 1.000, 1.000, 500000.0, 0.0, 30.0, 30.0, 31, " +
      "North, WGS-84, units=Meters}\n").getBytes(UTF_8)
    val d = extract(hdr)
    assert(d.status == Status.ParseSuccess, d.status)
    val ll = d.meta.get("envi.lat/lon").flatMap(_.headOption)
    assert(ll.isDefined, d.meta)
    val parts = ll.get.split(",").map(_.trim.toDouble)
    assert(math.abs(parts(0) - 0.0) < 1e-3, ll)
    assert(math.abs(parts(1) - 3.0) < 1e-3, ll)
    assert(text(d).contains("lat/lon = {"), text(d))
  }

  test("detection: magic on leading ENVI line; text .hdr stays text/plain") {
    val bytes = "ENVI\nsamples = 5\n".getBytes(UTF_8)
    assert(extract(bytes, "noext").mime == "application/envi.hdr")
    // reference parity: envi.hdr has no magic/sub-class in
    // tika-mimetypes.xml, so a text .hdr without the ENVI leader sniffs
    // as text/plain (the glob hint cannot specialize text/plain)
    val noMagic = "samples = 5\n".getBytes(UTF_8)
    assert(extract(noMagic, "img.hdr").mime == "text/plain")
    // ...but binary-ish .hdr content still specializes octet-stream
    val bin = Array.fill[Byte](32)(0x01) ++ "samples".getBytes(UTF_8)
    assert(extract(bin, "img.hdr").mime == "application/envi.hdr")
  }
}
