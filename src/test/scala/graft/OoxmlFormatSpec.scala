package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8
import graft.corpus.Corpus
import graft.engine.{MetaSink, SpanSink}
import graft.ooxml.{DocxExtractor, XlsxExtractor, XlsxNumFormat}

/** Round-3 verdict item #5: XLSX number/date formatting through
  * styles.xml and DOCX list numbering through numbering.xml.
  */
class OoxmlFormatSpec extends AnyFunSuite {

  test("number-format engine: dates, decimals, grouping, percent, General") {
    // Excel serial 44927 = 2023-01-01; 45000 = 2023-03-15
    assert(XlsxNumFormat.format("44927", "m/d/yy") == "1/1/23")
    assert(XlsxNumFormat.format("45000", "m/d/yy") == "3/15/23")
    assert(XlsxNumFormat.format("45000", "yyyy-mm-dd") == "2023-03-15")
    assert(XlsxNumFormat.format("45000", "d-mmm-yy") == "15-Mar-23")
    assert(XlsxNumFormat.format("45000.5", "m/d/yy h:mm") == "3/15/23 12:00")
    assert(XlsxNumFormat.format("45000.25", "h:mm:ss") == "6:00:00")
    assert(XlsxNumFormat.format("45000.75", "h:mm AM/PM") == "6:00 PM")
    assert(XlsxNumFormat.format("1234.5", "0.00") == "1234.50")
    assert(XlsxNumFormat.format("1234.5", "0") == "1235")
    assert(XlsxNumFormat.format("1234567.891", "#,##0.00") == "1,234,567.89")
    assert(XlsxNumFormat.format("1234567.891", "#,##0") == "1,234,568")
    assert(XlsxNumFormat.format("0.1234", "0.00%") == "12.34%")
    assert(XlsxNumFormat.format("0.5", "0%") == "50%")
    assert(XlsxNumFormat.format("42", "General") == "42")
    assert(XlsxNumFormat.format("3.14", "General") == "3.14")
    assert(XlsxNumFormat.format("2.50", "General") == "2.5")
  }

  private def styledXlsx: Array[Byte] = {
    val sheet =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
      """<row r="1"><c r="A1" s="1"><v>45000</v></c>""" +
      """<c r="B1" s="2"><v>1234.5</v></c>""" +
      """<c r="C1" s="3"><v>0.25</v></c>""" +
      """<c r="D1"><v>7</v></c>""" +
      """<c r="E1" t="b"><v>1</v></c></row>""" +
      """</sheetData></worksheet>"""
    val styles =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
      """<numFmts count="1"><numFmt numFmtId="164" formatCode="yyyy-mm-dd"/></numFmts>""" +
      """<cellXfs count="4"><xf numFmtId="0"/><xf numFmtId="164"/>""" +
      """<xf numFmtId="4"/><xf numFmtId="9"/></cellXfs></styleSheet>"""
    val workbook =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
      """<sheets><sheet name="Dated" sheetId="1" r:id="rId1"/></sheets></workbook>"""
    val wbRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
      """</Relationships>"""
    Corpus.zip(Seq(
      "xl/workbook.xml" -> workbook.getBytes(UTF_8),
      "xl/_rels/workbook.xml.rels" -> wbRels.getBytes(UTF_8),
      "xl/styles.xml" -> styles.getBytes(UTF_8),
      "xl/worksheets/sheet1.xml" -> sheet.getBytes(UTF_8)))
  }

  test("styled xlsx: cells format through cellXfs/numFmt like the reference") {
    val sink = new SpanSink(); val meta = new MetaSink
    XlsxExtractor.extract(styledXlsx, sink, meta)
    val text = sink.result().map(_.text).mkString
    assert(text.contains("2023-03-15"), text)   // custom date numFmt 164
    assert(text.contains("1,234.50"), text)     // builtin 4 #,##0.00
    assert(text.contains("25%"), text)          // builtin 9 0%
    assert(text.contains("\t7"), text)          // General int unchanged
    assert(text.contains("TRUE"), text)         // boolean cell
  }

  private def numberedDocx: Array[Byte] = {
    val numbering =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<w:numbering xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">""" +
      """<w:abstractNum w:abstractNumId="0">""" +
      """<w:lvl w:ilvl="0"><w:start w:val="1"/><w:numFmt w:val="decimal"/><w:lvlText w:val="%1."/></w:lvl>""" +
      """<w:lvl w:ilvl="1"><w:start w:val="1"/><w:numFmt w:val="lowerLetter"/><w:lvlText w:val="%1.%2."/></w:lvl>""" +
      """</w:abstractNum>""" +
      """<w:abstractNum w:abstractNumId="1">""" +
      """<w:lvl w:ilvl="0"><w:start w:val="1"/><w:numFmt w:val="bullet"/><w:lvlText w:val="·"/></w:lvl>""" +
      """</w:abstractNum>""" +
      """<w:num w:numId="1"><w:abstractNumId w:val="0"/></w:num>""" +
      """<w:num w:numId="2"><w:abstractNumId w:val="1"/></w:num>""" +
      """</w:numbering>"""
    def p(numId: Int, ilvl: Int, text: String) =
      s"""<w:p><w:pPr><w:numPr><w:ilvl w:val="$ilvl"/><w:numId w:val="$numId"/></w:numPr></w:pPr>""" +
      s"""<w:r><w:t>$text</w:t></w:r></w:p>"""
    val doc =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"><w:body>""" +
      p(1, 0, "first item") + p(1, 0, "second item") +
      p(1, 1, "nested one") + p(1, 1, "nested two") +
      p(1, 0, "third item") + p(1, 1, "restarted nest") +
      p(2, 0, "a bullet") +
      """</w:body></w:document>"""
    Corpus.zip(Seq(
      "word/document.xml" -> doc.getBytes(UTF_8),
      "word/numbering.xml" -> numbering.getBytes(UTF_8)))
  }

  test("docx list numbering: decimal, nested letters, restart, bullets") {
    val sink = new SpanSink(); val meta = new MetaSink
    DocxExtractor.extract(numberedDocx, sink, meta)
    val lines = sink.result().map(_.text).mkString.split("\n").toVector
    assert(lines(0) == "1. first item", lines)
    assert(lines(1) == "2. second item", lines)
    assert(lines(2) == "2.a. nested one", lines)
    assert(lines(3) == "2.b. nested two", lines)
    assert(lines(4) == "3. third item", lines)
    assert(lines(5) == "3.a. restarted nest", lines) // deeper level restarted
    assert(lines(6) == "· a bullet", lines)
  }
  private def overrideDocx: Array[Byte] = {
    // numId 1 uses abstract 0 but overrides level 0: startOverride 5;
    // numId 2 fully redefines level 0 as upperRoman "(%1)"
    val numbering =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<w:numbering xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">""" +
      """<w:abstractNum w:abstractNumId="0">""" +
      """<w:lvl w:ilvl="0"><w:start w:val="1"/><w:numFmt w:val="decimal"/><w:lvlText w:val="%1."/></w:lvl>""" +
      """</w:abstractNum>""" +
      """<w:num w:numId="1"><w:abstractNumId w:val="0"/>""" +
      """<w:lvlOverride w:ilvl="0"><w:startOverride w:val="5"/></w:lvlOverride></w:num>""" +
      """<w:num w:numId="2"><w:abstractNumId w:val="0"/>""" +
      """<w:lvlOverride w:ilvl="0"><w:lvl w:ilvl="0"><w:start w:val="1"/>""" +
      """<w:numFmt w:val="upperRoman"/><w:lvlText w:val="(%1)"/></w:lvl></w:lvlOverride></w:num>""" +
      """</w:numbering>"""
    def p(numId: Int, text: String) =
      s"""<w:p><w:pPr><w:numPr><w:ilvl w:val="0"/><w:numId w:val="$numId"/></w:numPr></w:pPr>""" +
      s"""<w:r><w:t>$text</w:t></w:r></w:p>"""
    val doc =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"><w:body>""" +
      p(1, "starts at five") + p(1, "then six") +
      p(2, "roman one") + p(2, "roman two") +
      """</w:body></w:document>"""
    Corpus.zip(Seq(
      "word/document.xml" -> doc.getBytes(UTF_8),
      "word/numbering.xml" -> numbering.getBytes(UTF_8)))
  }

  test("lvlOverride: startOverride and full level redefinition") {
    val sink = new SpanSink(); val meta = new MetaSink
    DocxExtractor.extract(overrideDocx, sink, meta)
    val lines = sink.result().map(_.text).mkString.split("\n").toVector
    assert(lines(0) == "5. starts at five", lines)
    assert(lines(1) == "6. then six", lines)
    assert(lines(2) == "(I) roman one", lines)
    assert(lines(3) == "(II) roman two", lines)
  }

}
