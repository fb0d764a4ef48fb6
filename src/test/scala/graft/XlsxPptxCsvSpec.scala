package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Extractor, MetaSink, SpanSink}
import graft.core.{DocRow, Span, Status}
import graft.corpus.Corpus
import graft.ooxml.{PptxExtractor, XlsxExtractor}
import graft.textparse.CsvExtractor

class XlsxPptxCsvSpec extends AnyFunSuite {

  test("xlsx: shared strings resolved, cells tab-prefixed, rows newline-terminated") {
    val bytes = Corpus.xlsxDoc(Corpus.rng(42))
    val sink = new SpanSink()
    XlsxExtractor.extract(bytes, sink, new MetaSink)
    val t = sink.result().filter(_.kind == "text").map(_.text).mkString
    // every row: 6 cells → 6 tabs then newline (3 plain + 3 styled)
    val rows = t.split("\n").filter(_.nonEmpty)
    assert(rows.nonEmpty)
    assert(rows.forall(_.count(_ == '\t') == 6), t)
    assert(rows.head.split("\t").filter(_.nonEmpty).length == 6)
    // styled cells render formatted: date serial, grouped decimal, percent
    val cells = rows.head.split("\t").filter(_.nonEmpty)
    assert(cells(3).matches("\\d{4}-\\d{2}-\\d{2}"), cells.mkString("|"))
    assert(cells(4).matches("[\\d,]+\\.\\d{2}"), cells.mkString("|"))
    assert(cells(5).endsWith("%"), cells.mkString("|"))
  }

  test("xlsx through the engine: detected + parsed") {
    val row = DocRow("x1", Seq(Span("bytes", Corpus.b64(Corpus.xlsxDoc(Corpus.rng(1))), null, 0)))
    val out = Extractor.extract(row)
    assert(out.mime == "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet")
    assert(out.status == Status.ParseSuccess)
    assert(out.n_chars > 0)
  }

  test("pptx: slides in presentation order, paragraphs newline-terminated") {
    val bytes = Corpus.pptxDoc(Corpus.rng(7))
    val sink = new SpanSink()
    PptxExtractor.extract(bytes, sink, new MetaSink)
    val t = sink.result().filter(_.kind == "text").map(_.text).mkString
    assert(t.nonEmpty)
    assert(t.endsWith("\n"))
    assert(t.split("\n").count(_.trim.nonEmpty) >= 2)
  }

  test("pptx through the engine") {
    val row = DocRow("p1", Seq(Span("bytes", Corpus.b64(Corpus.pptxDoc(Corpus.rng(2))), null, 0)))
    val out = Extractor.extract(row)
    assert(out.mime ==
      "application/vnd.openxmlformats-officedocument.presentationml.presentation")
    assert(out.status == Status.ParseSuccess)
  }

  test("csv sniffer: consistent delimiter found, inconsistent rejected") {
    assert(CsvExtractor.sniff("a,b,c\n1,2,3\n4,5,6").contains(','))
    assert(CsvExtractor.sniff("a\tb\n1\t2").contains('\t'))
    assert(CsvExtractor.sniff("just a plain sentence").isEmpty)
    assert(CsvExtractor.sniff("a,b,c\nno commas here at all\nx,y").isEmpty)
  }

  test("csv quoting: quoted delimiter and escaped quotes") {
    assert(CsvExtractor.splitLine("""a,"b,c",d""", ',') == Vector("a", "b,c", "d"))
    assert(CsvExtractor.splitLine("x,\"say \"\"hi\"\"\",z", ',') ==
      Vector("x", "say \"hi\"", "z"))
  }

  test("csv through the engine: mime text/csv, table-shaped spans") {
    val row = DocRow("c1", Seq(Span("bytes", Corpus.b64(Corpus.csvDoc(Corpus.rng(3))), null, 0)))
    val out = Extractor.extract(row)
    assert(out.mime == "text/csv")
    assert(out.status == Status.ParseSuccess)
    val t = out.spans.filter(_.kind == "text").map(_.text).mkString
    assert(t.contains("\tcol1\tcol2"))
    assert(out.meta.contains("csv:delimiter"))
  }

  test("plain prose stays text/plain (no false csv sniff)") {
    val prose = "this is a sentence.\nand another line without delimiters.\nthird line."
    val row = DocRow("c2", Seq(Span("bytes",
      Corpus.b64(prose.getBytes(java.nio.charset.StandardCharsets.UTF_8)), null, 0)))
    val out = Extractor.extract(row)
    assert(out.mime == "text/plain")
  }
}
