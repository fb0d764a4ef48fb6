package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Extractor
import graft.core.{DocRow, Span, Status}
import graft.corpus.Corpus
import graft.ole2.Ole2Detector
import graft.mime.{MediaTypes => MT}

class Ole2Spec extends AnyFunSuite {

  /** CFB-shaped synthetic: valid magic + a directory-entry name in
    * UTF-16LE (the byte-scan target), padded to sector size.
    */
  private def cfbWith(entryName: String): Array[Byte] = {
    val header = Array(0xd0, 0xcf, 0x11, 0xe0, 0xa1, 0xb1, 0x1a, 0xe1)
      .map(_.toByte) ++ new Array[Byte](504)
    val dirSector = new Array[Byte](512)
    val name = entryName.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
    System.arraycopy(name, 0, dirSector, 0, name.length)
    header ++ dirSector
  }

  test("OLE2 subtype specialization by directory-entry names") {
    assert(Ole2Detector.specialize(cfbWith("WordDocument")) == MT.MsWord)
    assert(Ole2Detector.specialize(cfbWith("Workbook")) == MT.MsExcel)
    assert(Ole2Detector.specialize(cfbWith("PowerPoint Document")) == MT.MsPowerPoint)
    assert(Ole2Detector.specialize(cfbWith("SomethingElse")) == MT.TikaMsOffice)
  }

  test("engine: .doc-shaped payload -> application/msword, unsupported status") {
    val out = Extractor.extract(DocRow("ole1",
      Seq(Span("bytes", Corpus.b64(cfbWith("WordDocument")), null, 0))))
    assert(out.mime == MT.MsWord)
    assert(out.status == Status.UnsupportedType)
    assert(out.spans.isEmpty)
  }

  test("supertype chain: msword is a zip-free office specialization") {
    assert(graft.mime.MimeRegistry.isSpecializationOf(MT.MsWord, MT.TikaMsOffice))
    assert(!graft.mime.MimeRegistry.isSpecializationOf(MT.MsWord, MT.Zip))
  }
}
