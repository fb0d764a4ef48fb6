package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random
import graft.engine.{Extractor, MetaSink, SpanSink}
import graft.core.{DocRow, Span, Status}
import graft.corpus.{Corpus, OleCorpus}
import graft.ole2.{Cfb, CfbWriter, Ole2Detector}
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

  private def textOf(spans: Seq[Span]): String =
    spans.filter(_.kind == "text").map(_.text).mkString

  test("OLE2 subtype specialization by directory-entry names") {
    assert(Ole2Detector.specialize(cfbWith("WordDocument")) == MT.MsWord)
    assert(Ole2Detector.specialize(cfbWith("Workbook")) == MT.MsExcel)
    assert(Ole2Detector.specialize(cfbWith("PowerPoint Document")) == MT.MsPowerPoint)
    assert(Ole2Detector.specialize(cfbWith("SomethingElse")) == MT.TikaMsOffice)
  }

  test("engine: marker-only CFB fake -> detected type, recorded parse failure") {
    val out = Extractor.extract(DocRow("ole1",
      Seq(Span("bytes", Corpus.b64(cfbWith("WordDocument")), null, 0))))
    assert(out.mime == MT.MsWord)
    assert(out.status == Status.ParseException) // truncated container fails, not crashes
    assert(out.spans.isEmpty)
  }

  test("supertype chain: msword is a zip-free office specialization") {
    assert(graft.mime.MimeRegistry.isSpecializationOf(MT.MsWord, MT.TikaMsOffice))
    assert(!graft.mime.MimeRegistry.isSpecializationOf(MT.MsWord, MT.Zip))
  }

  test("CFB writer/reader round-trip: mini + regular streams") {
    val small = ("small.bin", Array.tabulate[Byte](100)(_.toByte))
    val mid = ("mid.bin", Array.tabulate[Byte](5000)(i => (i % 251).toByte))
    val big = ("big.bin", Array.tabulate[Byte](70000)(i => (i % 127).toByte))
    val bytes = CfbWriter.write(Seq(small, mid, big))
    assert(Cfb.isCfb(bytes))
    val doc = Cfb.parse(bytes)
    assert(doc.stream("small.bin").get.toSeq == small._2.toSeq) // mini-FAT path
    assert(doc.stream("mid.bin").get.toSeq == mid._2.toSeq)     // FAT path
    assert(doc.stream("big.bin").get.toSeq == big._2.toSeq)     // multi-sector chain
    assert(doc.stream("absent").isEmpty)
  }

  test(".doc round-trip: piece table with compressed + unicode pieces, field chars") {
    val bytes = OleCorpus.docFromPieces(Seq(
      ("First paragraph.\rCell1\u0007Cell2\r", true),
      ("Before \u0013HYPERLINK instr\u0014shown result\u0015 after\r" +
       "Unicode — é\r", false)))
    val sink = new SpanSink(); val meta = new MetaSink
    graft.ole2.DocExtractor.extract(bytes, sink, meta)
    val text = textOf(sink.result())
    assert(text.contains("First paragraph."))
    assert(text.contains("Cell1\tCell2"))          // 0x07 cell mark -> tab
    assert(text.contains("Before shown result after")) // instr dropped, result kept
    assert(!text.contains("HYPERLINK"))
    assert(text.contains("Unicode — é"))            // UTF-16 piece decoded
  }

  test(".xls round-trip: SST strings + numbers + RK by row/col order") {
    val bytes = OleCorpus.xlsFile(new Random(7))
    val sink = new SpanSink(); val meta = new MetaSink
    graft.ole2.XlsExtractor.extract(bytes, sink, meta)
    val text = textOf(sink.result())
    assert(text.startsWith("Sheet")) // sheet name frame
    val dataLines = text.split("\n").drop(1).filter(_.nonEmpty)
    assert(dataLines.nonEmpty)
    // every data row is string<TAB>number<TAB>rk-int
    dataLines.foreach { l =>
      val cells = l.split("\t")
      assert(cells.length == 3, s"row '$l'")
      assert(cells(1).forall(_.isDigit))
      assert(cells(2).forall(_.isDigit))
    }
  }

  test("RK decoding: int, x100 and float forms") {
    import graft.ole2.XlsExtractor.decodeRk
    assert(decodeRk((1234 << 2) | 0x02) == 1234.0)
    assert(decodeRk((1234 << 2) | 0x03) == 12.34)
    val d = 2.5
    val rk = ((java.lang.Double.doubleToLongBits(d) >> 32) & 0xFFFFFFFCL).toInt
    assert(decodeRk(rk) == 2.5)
  }

  test(".ppt round-trip: slide text atoms in order") {
    val bytes = OleCorpus.pptFile(new Random(11))
    val sink = new SpanSink(); val meta = new MetaSink
    graft.ole2.PptExtractor.extract(bytes, sink, meta)
    val text = textOf(sink.result())
    assert(text.nonEmpty)
    assert(text.split("\n").count(_.nonEmpty) >= 2) // title + body per slide
  }

  test(".msg round-trip: subject/from/to metadata + body") {
    val bytes = OleCorpus.msgFile(new Random(13))
    val sink = new SpanSink(); val meta = new MetaSink
    graft.ole2.MsgExtractor.extract(bytes, sink, meta)
    val m = meta.result()
    assert(m.contains("subject") && m.contains("message:from") && m.contains("message:to"))
    assert(textOf(sink.result()).contains(m("subject").head))
  }

  test("engine end-to-end: corpus doc/xls/ppt/msg rows parse_success with text") {
    for (kind <- Seq("doc", "xls", "ppt", "msg")) {
      val idx = (0L until 1000L).find(i => Corpus.kindOf(i) == kind).get
      val out = Extractor.extract(Corpus.row(idx))
      assert(out.status == Status.ParseSuccess, s"$kind -> ${out.status}")
      assert(out.spans.nonEmpty, s"$kind produced no spans")
      val expectedMime = kind match {
        case "doc" => MT.MsWord
        case "xls" => MT.MsExcel
        case "ppt" => MT.MsPowerPoint
        case "msg" => MT.MsOutlook
      }
      assert(out.mime == expectedMime)
    }
  }
}
