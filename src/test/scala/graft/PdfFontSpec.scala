package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.ISO_8859_1
import graft.engine.{MetaSink, SpanSink}
import graft.pdf.PdfExtractor

/** Subset-font PDFs: explicit /Widths + /ToUnicode CMap decode — the
  * path most real-world PDFs take (PDFBox resolves ToUnicode before the
  * font encoding; SURVEY.md §2.5).
  */
class PdfFontSpec extends AnyFunSuite {

  private def subsetPdf(content: String): Array[Byte] = {
    val cmap =
      """/CIDInit /ProcSet findresource begin
begincmap
2 beginbfchar
<01> <0048>
<02> <0069>
endbfchar
1 beginbfrange
<03> <05> <0061>
endbfrange
endcmap
end"""
    val pdf = new StringBuilder
    pdf.append("%PDF-1.7\n")
    pdf.append("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    pdf.append("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    pdf.append("3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Resources << /Font << /F2 4 0 R >> >> /Contents 6 0 R >>\nendobj\n")
    pdf.append("4 0 obj\n<< /Type /Font /Subtype /TrueType /BaseFont /AAAAAA+Sub " +
      "/FirstChar 1 /LastChar 5 /Widths [600 600 600 600 600] /ToUnicode 5 0 R >>\nendobj\n")
    pdf.append(s"5 0 obj\n<< /Length ${cmap.length} >>\nstream\n$cmap\nendstream\nendobj\n")
    pdf.append(s"6 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n")
    pdf.append("trailer\n<< /Root 1 0 R >>\n%%EOF\n")
    pdf.toString.getBytes(ISO_8859_1)
  }

  private def extract(bytes: Array[Byte]): String = {
    val sink = new SpanSink()
    PdfExtractor.extract(bytes, sink, new MetaSink)
    sink.result().filter(_.kind == "text").map(_.text).mkString
  }

  test("ToUnicode bfchar + bfrange decode with hex show strings") {
    val t = extract(subsetPdf(
      "BT /F2 12 Tf 72 712 Td <0102> Tj 0 -14 Td <030405> Tj ET"))
    assert(t.startsWith("Hi\nabc"), t)
  }

  test("explicit /Widths drive the word separator") {
    // width 600/1000*12 = 7.2pt per glyph; a TJ gap of -600 = 7.2pt
    // exceeds 0.5 x spaceWidth (space width falls back to code 32 ->
    // Helvetica 278 since 32 is outside [FirstChar,LastChar] widths)
    val t = extract(subsetPdf("BT /F2 12 Tf 72 712 Td [<01> -600 <02>] TJ ET"))
    assert(t.startsWith("H i"), t)
  }

  test("unmapped codes fall back to cp1252") {
    val t = extract(subsetPdf("BT /F2 12 Tf 72 712 Td <41> Tj ET"))
    assert(t.startsWith("A"), t)
  }
}

class PdfType0Spec extends org.scalatest.funsuite.AnyFunSuite {
  import java.nio.charset.StandardCharsets.ISO_8859_1
  import graft.engine.{MetaSink, SpanSink}
  import graft.pdf.PdfExtractor

  private def type0Pdf(content: String): Array[Byte] = {
    val cmap =
      """/CIDInit /ProcSet findresource begin
begincmap
2 beginbfchar
<0001> <0048>
<0002> <00E9>
endbfchar
1 beginbfrange
<0003> <0005> <0061>
endbfrange
endcmap
end"""
    val pdf = new StringBuilder
    pdf.append("%PDF-1.7\n")
    pdf.append("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    pdf.append("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    pdf.append("3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Resources << /Font << /F0 4 0 R >> >> /Contents 7 0 R >>\nendobj\n")
    pdf.append("4 0 obj\n<< /Type /Font /Subtype /Type0 /BaseFont /GRAFT+CID " +
      "/Encoding /Identity-H /DescendantFonts [5 0 R] /ToUnicode 6 0 R >>\nendobj\n")
    pdf.append("5 0 obj\n<< /Type /Font /Subtype /CIDFontType2 /BaseFont /GRAFT+CID " +
      "/DW 500 /W [1 [700 700] 3 5 650] >>\nendobj\n")
    pdf.append(s"6 0 obj\n<< /Length ${cmap.length} >>\nstream\n$cmap\nendstream\nendobj\n")
    pdf.append(s"7 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n")
    pdf.append("trailer\n<< /Root 1 0 R >>\n%%EOF\n")
    pdf.toString.getBytes(ISO_8859_1)
  }

  private def extract(bytes: Array[Byte]): String = {
    val sink = new SpanSink()
    PdfExtractor.extract(bytes, sink, new MetaSink)
    sink.result().filter(_.kind == "text").map(_.text).mkString
  }

  test("Type0/Identity-H: 2-byte codes through ToUnicode") {
    val t = extract(type0Pdf(
      "BT /F0 12 Tf 72 712 Td <00010002> Tj 0 -14 Td <000300040005> Tj ET"))
    assert(t.startsWith("Hé\nabc"), t)
  }

  test("CID /W widths drive the word separator; TJ gap") {
    // glyph width 700/1000*12=8.4pt; gap -700 = 8.4pt > 0.5*spaceWidth(500/1000*12=6 -> 3)
    val t = extract(type0Pdf("BT /F0 12 Tf 72 712 Td [<0001> -700 <0002>] TJ ET"))
    assert(t.startsWith("H é") || t.startsWith("Hé"), t)
    // verify a space IS inserted for the large gap
    assert(t.contains(" "), t)
  }
}
