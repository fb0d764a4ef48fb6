package graft.xmlx

import org.xml.sax.Attributes
import org.xml.sax.helpers.DefaultHandler
import graft.engine.{MetaSink, SpanSink}

/** Word 2003 WordprocessingML and Excel 2003 SpreadsheetML — the
  * single-file XML office formats that predate OOXML.
  *
  * Reference semantics: tika-parser-microsoft-module
  *  - `microsoft/xml/AbstractXML2003Parser.java:129-147` —
  *    `o:DocumentProperties` children (Title/Author/LastAuthor/Created/
  *    LastSaved/Version/Company, urn:schemas-microsoft-com:office:office)
  *    land in metadata;
  *  - `microsoft/xml/WordMLParser.java:56-61,110-190` — `w:p`
  *    paragraphs, `w:br` newlines, `w:tbl`/`w:tr`/`w:tc` tables, body
  *    characters pass through except inside the IGNORE_CHARACTERS set
  *    `w:hlink`/`w:pict`/`w:binData`/document properties (hlink display
  *    text is dropped by the reference; we additionally record `w:dest`
  *    under the engine's `links` metadata convention);
  *  - `microsoft/xml/SpreadsheetMLParser.java:72-172` — Worksheet →
  *    Table → Row → Cell/Data (urn:schemas-microsoft-com:office:
  *    spreadsheet), one td per CELL (a Cell without Data still holds
  *    its column), each Data trimmed into its cell, `ss:HRef` on the
  *    Cell wraps the value in a link.
  */
object MsXml2003Extractor {

  val WordMl = "application/vnd.ms-wordml"
  val SpreadsheetMl = "application/vnd.ms-spreadsheetml"

  private val OfficeUrn = "urn:schemas-microsoft-com:office:office"
  private val SpreadsheetUrn = "urn:schemas-microsoft-com:office:spreadsheet"
  private val WordMlUrl = "http://schemas.microsoft.com/office/word/2003/wordml"

  private val PropKeys = Map(
    "Title" -> "dc:title", "Author" -> "dc:creator",
    "LastAuthor" -> "meta:last-author", "Created" -> "dcterms:created",
    "LastSaved" -> "dcterms:modified", "Version" -> "cp:version",
    "Company" -> "extended-properties:Company",
    "Pages" -> "meta:page-count", "Words" -> "meta:word-count")

  /** Shared o:DocumentProperties capture. */
  private class PropsHandler(meta: MetaSink) extends DefaultHandler {
    private var key: String = null
    private val buf = new StringBuilder
    override def startElement(u: String, l: String, q: String,
        a: Attributes): Unit =
      if (u == OfficeUrn && PropKeys.contains(l)) { key = PropKeys(l); buf.setLength(0) }
    override def characters(ch: Array[Char], s: Int, n: Int): Unit =
      if (key != null) buf.appendAll(ch, s, n)
    override def endElement(u: String, l: String, q: String): Unit =
      if (key != null && u == OfficeUrn && PropKeys.get(l).contains(key)) {
        val v = buf.toString.trim
        if (v.nonEmpty) meta.set(key, v)
        key = null
      }
  }

  def extractWordMl(bytes: Array[Byte], sink: SpanSink, meta: MetaSink): Unit = {
    val props = new PropsHandler(meta)
    NsSax.parse(bytes, new DefaultHandler {
      private var inBody = false
      private var ignoreDepth = 0 // hlink / pict / binData / DocumentProperties
      private var lineHasText = false
      private def endLine(): Unit = { sink.newline(); lineHasText = false }
      override def startElement(u: String, l: String, q: String,
          a: Attributes): Unit = {
        props.startElement(u, l, q, a)
        if (u == WordMlUrl) l match {
          case "body" => inBody = true
          case "br" => sink.chars("\n")
          case "pict" | "binData" => ignoreDepth += 1
          case "hlink" => // reference drops hlink display text entirely
            ignoreDepth += 1
            Option(a.getValue(WordMlUrl, "dest")).filter(_.nonEmpty)
              .foreach(meta.add("links", _))
          case _ => ()
        }
        else if (u == OfficeUrn && l == "DocumentProperties") ignoreDepth += 1
      }
      override def characters(ch: Array[Char], s: Int, n: Int): Unit = {
        props.characters(ch, s, n)
        if (inBody && ignoreDepth == 0) {
          val t = new String(ch, s, n)
          if (t.nonEmpty) { sink.chars(t); if (t.trim.nonEmpty) lineHasText = true }
        }
      }
      override def endElement(u: String, l: String, q: String): Unit = {
        props.endElement(u, l, q)
        if (u == WordMlUrl) l match {
          case "p" | "tr" => if (lineHasText) endLine()
          case "tc" => sink.tab()
          case "pict" | "binData" | "hlink" =>
            ignoreDepth = math.max(0, ignoreDepth - 1)
          case _ => ()
        }
        else if (u == OfficeUrn && l == "DocumentProperties")
          ignoreDepth = math.max(0, ignoreDepth - 1)
      }
    })
  }

  def extractSpreadsheetMl(bytes: Array[Byte], sink: SpanSink,
      meta: MetaSink): Unit = {
    val props = new PropsHandler(meta)
    NsSax.parse(bytes, new DefaultHandler {
      private var inData = false
      private val buf = new StringBuilder
      private var cellsInRow = 0
      override def startElement(u: String, l: String, q: String,
          a: Attributes): Unit = {
        props.startElement(u, l, q, a)
        if (u == SpreadsheetUrn) l match {
          case "Row" => cellsInRow = 0
          case "Cell" =>
            // one td per Cell (SpreadsheetMLParser CELL case): a Cell
            // without a Data child still holds its column
            if (cellsInRow > 0) sink.tab()
            cellsInRow += 1
            Option(a.getValue(SpreadsheetUrn, "HRef")).filter(_.nonEmpty)
              .foreach(meta.add("links", _))
          case "Data" => inData = true; buf.setLength(0)
          case _ => ()
        }
      }
      override def characters(ch: Array[Char], s: Int, n: Int): Unit = {
        props.characters(ch, s, n)
        if (inData) buf.appendAll(ch, s, n)
      }
      override def endElement(u: String, l: String, q: String): Unit = {
        props.endElement(u, l, q)
        if (u == SpreadsheetUrn) l match {
          case "Data" =>
            inData = false
            sink.chars(buf.toString.trim)
          case "Row" => if (cellsInRow > 0) sink.newline()
          case _ => ()
        }
      }
    })
  }
}
