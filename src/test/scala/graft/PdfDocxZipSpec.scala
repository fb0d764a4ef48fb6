package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import graft.engine.{Extractor, MetaSink, SpanSink}
import graft.core.{DocRow, Span, Status}
import graft.corpus.Corpus
import graft.pdf.PdfExtractor
import graft.ooxml.DocxExtractor

class PdfSpec extends AnyFunSuite {

  private def pdfText(pages: Seq[String], flate: Boolean = false): String = {
    val contents = pages.map(_.getBytes(ISO_8859_1))
    val bytes = Corpus.buildPdf(contents, flate)
    val sink = new SpanSink()
    PdfExtractor.extract(bytes, sink, new MetaSink)
    sink.result().filter(_.kind == "text").map(_.text).mkString
  }

  test("single line Tj") {
    val t = pdfText(Seq("BT /F1 12 Tf 72 712 Td (Hello World) Tj ET"))
    assert(t.startsWith("Hello World"))
  }

  test("line breaks on Td y-jumps (dropThreshold semantics)") {
    val t = pdfText(Seq(
      "BT /F1 12 Tf 72 712 Td (Line one) Tj 0 -14 Td (Line two) Tj ET"))
    assert(t.contains("Line one\nLine two"))
  }

  test("TJ kerning gap inserts a word separator (spacingTolerance 0.5)") {
    // -600/1000 * 12pt = 7.2pt gap > 0.5 * space width (0.5*278/1000*12=1.67)
    val t = pdfText(Seq("BT /F1 12 Tf 72 712 Td [(Hello) -600 (World)] TJ ET"))
    assert(t.contains("Hello World"))
  }

  test("small TJ kerning does NOT insert a space") {
    // -100/1000*12 = 1.2pt < 1.67pt tolerance
    val t = pdfText(Seq("BT /F1 12 Tf 72 712 Td [(Hel) -100 (lo)] TJ ET"))
    assert(t.contains("Hello") || t.contains("Hel lo") == false)
  }

  test("T* with TL leading advances lines; ' operator shows") {
    val t = pdfText(Seq(
      "BT /F1 12 Tf 14 TL 72 712 Td (first) Tj (second) ' ET"))
    assert(t.contains("first\nsecond"))
  }

  test("two pages → page-separated spans ending \\n\\n") {
    val contents = Seq(
      "BT /F1 12 Tf 72 712 Td (Page one text) Tj ET",
      "BT /F1 12 Tf 72 712 Td (Page two text) Tj ET").map(_.getBytes(ISO_8859_1))
    val bytes = Corpus.buildPdf(contents, flate = false)
    val sink = new SpanSink()
    val meta = new MetaSink
    PdfExtractor.extract(bytes, sink, meta)
    val spans = sink.result()
    assert(spans.length == 2)
    assert(spans(0).text == "Page one text\n\n")
    assert(spans(1).text == "Page two text\n\n")
    assert(spans(1).offset == spans(0).text.length)
    assert(meta.result()("xmpTPg:NPages") == Seq("2"))
  }

  test("FlateDecode round trip") {
    val t = pdfText(Seq("BT /F1 12 Tf 72 712 Td (Compressed content) Tj ET"),
      flate = true)
    assert(t.contains("Compressed content"))
  }

  test("escapes in literal strings") {
    val t = pdfText(Seq("BT /F1 12 Tf 72 712 Td (paren \\( close \\) back\\\\slash) Tj ET"))
    assert(t.contains("paren ( close ) back\\slash"))
  }

  test("trailer /Info dict -> dc metadata") {
    val bytes = Corpus.buildPdf(
      Seq("BT /F1 12 Tf 72 712 Td (Body) Tj ET".getBytes(ISO_8859_1)),
      flate = false, info = Some(("My Pdf Title", "An Author")))
    val meta = new MetaSink
    PdfExtractor.extract(bytes, new SpanSink(), meta)
    assert(meta.result()("dc:title") == Seq("My Pdf Title"))
    assert(meta.result()("dc:creator") == Seq("An Author"))
  }

  test("corpus pdf extracts deterministic text") {
    val a = {
      val sink = new SpanSink()
      PdfExtractor.extract(Corpus.pdfDoc(Corpus.rng(650), 650), sink, new MetaSink)
      sink.result()
    }
    val b = {
      val sink = new SpanSink()
      PdfExtractor.extract(Corpus.pdfDoc(Corpus.rng(650), 650), sink, new MetaSink)
      sink.result()
    }
    assert(a == b)
    assert(a.exists(s => s.kind == "text" && s.text.trim.nonEmpty))
  }
}

class DocxSpec extends AnyFunSuite {

  private def extract(bytes: Array[Byte]): (Vector[Span], Map[String, Seq[String]]) = {
    val sink = new SpanSink()
    val meta = new MetaSink
    DocxExtractor.extract(bytes, sink, meta)
    (sink.result(), meta.result())
  }

  test("corpus docx: paragraphs newline-terminated, tab runs, table cells") {
    val (spans, meta) = extract(Corpus.docxDoc(Corpus.rng(0)))
    val t = spans.filter(_.kind == "text").map(_.text).mkString
    assert(t.contains("Col1\t"))             // w:tab → '\t'
    assert(t.contains("link text"))          // hyperlink text present
    assert(t.split('\n').length > 3)         // paragraph newlines
    assert(meta.contains("dc:title"))
    assert(meta.contains("dc:creator"))
    assert(meta("links").head == "http://example.com/linked")
  }

  test("table cells tab-prefixed, rows newline-terminated") {
    // build a minimal docx with one 2x2 table
    val docXml =
      """<?xml version="1.0"?><w:document xmlns:w="http://x"><w:body>
      <w:tbl><w:tr><w:tc><w:p><w:r><w:t>A</w:t></w:r></w:p></w:tc>
      <w:tc><w:p><w:r><w:t>B</w:t></w:r></w:p></w:tc></w:tr></w:tbl>
      </w:body></w:document>"""
    val zip = Corpus.zip(Seq(
      "[Content_Types].xml" -> "<Types/>".getBytes(UTF_8),
      "word/document.xml" -> docXml.getBytes(UTF_8)))
    val (spans, _) = extract(zip)
    val t = spans.map(_.text).mkString
    // \tA\n (p-end inside cell) \tB\n then row \n table \n
    assert(t.contains("\tA"))
    assert(t.contains("\tB"))
    assert(t.endsWith("\n"))
  }
}

class ContainerSpec extends AnyFunSuite {

  test("zip recursion: entries in order with ordinal id paths " +
       "(RecursiveParserWrapper.java:239-244)") {
    val zip = Corpus.zip(Seq(
      "one.html" -> "<html><body><p>first entry</p></body></html>".getBytes(UTF_8),
      "two.txt" -> "second entry text".getBytes(UTF_8)))
    val row = DocRow("d1", Seq(Span("zip", Corpus.b64(zip), null, 0)))
    val out = Extractor.extract(row)
    assert(out.mime == "application/zip")
    assert(out.status == Status.ParseSuccess)
    val kinds = out.spans.map(s => (s.kind, s.media_ref))
    assert(kinds.contains(("embedded-open", "/1")))
    assert(kinds.contains(("embedded-close", "/1")))
    assert(kinds.contains(("embedded-open", "/2")))
    val t = out.spans.filter(_.kind == "text").map(_.text).mkString
    assert(t.indexOf("first entry") < t.indexOf("second entry"))
    assert(out.meta("embedded:path") ==
      Seq("/1:one.html", "/2:two.txt"))
  }

  test("nested zip-of-zip gets nested id paths") {
    val inner = Corpus.zip(Seq("a.txt" -> "deep text".getBytes(UTF_8)))
    val outer = Corpus.zip(Seq("inner.zip" -> inner,
      "b.txt" -> "shallow".getBytes(UTF_8)))
    val out = Extractor.extract(DocRow("d2", Seq(Span("zip", Corpus.b64(outer), null, 0))))
    val opens = out.spans.filter(_.kind == "embedded-open").map(_.media_ref)
    assert(opens == Vector("/1", "/1/2", "/3"))
    assert(out.spans.filter(_.kind == "text").map(_.text).mkString.contains("deep text"))
  }

  test("gzip decompress-then-redetect (CompressorParser semantics)") {
    val gz = Corpus.gzipBytes("<html><body><p>zipped html</p></body></html>".getBytes(UTF_8))
    val out = Extractor.extract(DocRow("d3", Seq(Span("gzip", Corpus.b64(gz), null, 0))))
    assert(out.mime == "application/gzip")
    assert(out.spans.filter(_.kind == "text").map(_.text).mkString.contains("zipped html"))
  }

  test("write limit trips on bomb-shaped zip with default config") {
    val out = Extractor.extract(
      DocRow("d4", Seq(Span("zip", Corpus.b64(Corpus.bombZip(Corpus.rng(0))), null, 0))))
    assert(out.status == Status.WriteLimitReached)
    assert(out.n_chars <= 100000)
  }

  test("zip-bomb guard trips when write limit is high " +
       "(SecureContentHandler.java:54-69)") {
    val cfg = Extractor.DefaultConfig.copy(writeLimit = 10000000)
    val out = Extractor.extract(
      DocRow("d5", Seq(Span("zip", Corpus.b64(Corpus.bombZip(Corpus.rng(0))), null, 0))), cfg)
    assert(out.status == Status.ZipBomb)
  }

  test("junk bytes → octet-stream, unsupported_type, zero spans") {
    val junk = Array.tabulate(300)(i => ((i * 37) % 251).toByte)
    junk(0) = 0x01
    val out = Extractor.extract(DocRow("d6", Seq(Span("junk", Corpus.b64(junk), null, 0))))
    assert(out.mime == "application/octet-stream")
    assert(out.status == Status.UnsupportedType)
    assert(out.spans.isEmpty)
  }

  test("interleaved text + media doc preserves media span order") {
    val row = Corpus.row(3) // html doc with media interleave (index%10==3)
    val out = Extractor.extract(row)
    val mediaRefs = out.spans.filter(_.kind == "media").map(_.media_ref)
    assert(mediaRefs.exists(_.startsWith("blob://")))
    assert(out.status == Status.ParseSuccess)
  }

  test("every corpus kind extracts with expected mime/status") {
    val expectations = Map(
      "html" -> "text/html", "docx" ->
        "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
      "xlsx" -> "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
      "pptx" -> "application/vnd.openxmlformats-officedocument.presentationml.presentation",
      "pdf" -> "application/pdf", "zip" -> "application/zip",
      "xml" -> "application/xml", "text" -> "text/plain", "csv" -> "text/csv",
      "rtf" -> "application/rtf", "eml" -> "message/rfc822",
      "odt" -> "application/vnd.oasis.opendocument.text")
    var checked = 0
    (0L until 1000L).foreach { i =>
      val kind = Corpus.kindOf(i)
      if (expectations.contains(kind) && !Corpus.isBombShaped(i)) {
        val out = Extractor.extract(Corpus.row(i))
        val want =
          if (kind == "odt" && i % 5 == 4) // v21: every fifth odt is flat
            "application/vnd.oasis.opendocument.flat.text"
          else expectations(kind)
        assert(out.mime == want, s"idx=$i kind=$kind got ${out.mime}")
        val okStatus = out.status == Status.ParseSuccess ||
          out.status == Status.ParseSuccessWithException ||
          (Corpus.isOversized(i) && out.status == Status.WriteLimitReached)
        assert(okStatus, s"idx=$i → ${out.status}")
        checked += 1
      }
    }
    assert(checked > 800)
  }

  test("offsets strictly non-decreasing and consistent with text lengths") {
    (0L until 200L).foreach { i =>
      val out = Extractor.extract(Corpus.row(i))
      var expected = 0
      out.spans.foreach { s =>
        assert(s.offset == expected, s"idx=$i span offset ${s.offset} != $expected")
        if (s.kind == "text") expected += s.text.length
      }
    }
  }
}
