package graft

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{DocRow, Span, Status}
import graft.corpus.Corpus
import graft.engine.{Extractor, MetaSink, SpanSink}
import graft.sci.FitsExtractor

/** FITS primary-header parity with TestGDALParser.testParseFITS
  * (the reference reads this fixture through gdalinfo's FITS driver).
  */
class FitsSpec extends AnyFunSuite {

  private val fixture = Path.of("/root/reference/tika-parsers/" +
    "tika-parsers-extended/tika-parser-scientific-module/" +
    "src/test/resources/test-documents/WFPC2u5780205r_c0fx.fits")

  private def metaOf(): Map[String, Seq[String]] = {
    org.scalatest.Assertions.assume(Files.isRegularFile(fixture),
      "reference fixtures not present")
    val meta = new MetaSink
    FitsExtractor.extract(Files.readAllBytes(fixture), new SpanSink, meta)
    meta.result()
  }

  test("TestGDALParser.testParseFITS pins") {
    val m = metaOf()
    assert(m("ALLG-MIN") == Seq("-7.319537E1")) // raw card text, not parsed
    assert(m("ATODCORR") == Seq("COMPLETE"))
    assert(m("ATODFILE") == Seq("uref$dbu1405iu.r1h"))
    assert(m("CAL_VER") == Seq(" " * 24)) // blank string value preserved
    assert(m("CALIBDEF") == Seq("1466"))
  }

  test("structural keywords excluded; quoted strings unescaped") {
    val m = metaOf()
    assert(!m.contains("SIMPLE") && !m.contains("BITPIX") &&
      !m.contains("NAXIS1") && !m.contains("EXTEND"))
    assert(m("ORIGIN").head == "STScI-STSDAS") // card repeats; both kept
    assert(m("FILENAME") == Seq("u5780205r_cvt.c0h"))
    assert(m("fits:dimensions") == Seq("200x200x4"))
  }

  test("engine end-to-end: detection + clean status + body line") {
    org.scalatest.Assertions.assume(Files.isRegularFile(fixture),
      "reference fixtures not present")
    val b = Files.readAllBytes(fixture)
    val out = Extractor.extract(
      DocRow("WFPC2u5780205r_c0fx.fits", Seq(Span("bytes", Corpus.b64(b), null, 0))))
    assert(out.status == Status.ParseSuccess, out.status)
    assert(out.mime == "application/fits", out.mime)
    assert(out.spans.exists(s => s.kind == Span.KindText &&
      s.text.contains("200 x 200 x 4")))
  }

  test("truncated / damaged FITS payloads never escape the envelope") {
    org.scalatest.Assertions.assume(Files.isRegularFile(fixture),
      "reference fixtures not present")
    val valid = Files.readAllBytes(fixture)
    val rnd = new scala.util.Random(11)
    (0 until 24).foreach { i =>
      val mutated =
        if (i % 2 == 0) java.util.Arrays.copyOf(valid, 9 + rnd.nextInt(4000))
        else {
          val m = valid.clone()
          val pos = rnd.nextInt(math.min(m.length, 1 << 15))
          m(pos) = (m(pos) ^ (1 << rnd.nextInt(8))).toByte
          m
        }
      val out = Extractor.extract(
        DocRow("f.fits", Seq(Span("bytes", Corpus.b64(mutated), null, 0))))
      assert(out.status != null && out.mime != null)
    }
  }
}
