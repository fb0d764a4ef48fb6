package graft.odf

import org.xml.sax.Attributes
import org.xml.sax.helpers.DefaultHandler
import graft.engine.{MetaSink, SpanSink}
import graft.ooxml.DocxExtractor
import graft.zipx.ZipUtil

/** OpenDocument (ODT/ODS/ODP) text extraction over `content.xml`.
  *
  * Reference: tika-parsers miscoffice-module OpenDocumentParser
  * (SURVEY.md §2.7). SAX over the OpenDocument content stream:
  * `text:p`/`text:h` → newline-terminated paragraphs, `text:tab` → tab,
  * `text:line-break` → newline, `text:s` → expanded spaces, table cells
  * tab-prefixed; `meta.xml` dc:title/dc:creator → metadata.
  */
object OdtExtractor {

  def extract(zipBytes: Array[Byte], sink: SpanSink, meta: MetaSink): Unit = {
    val parts = ZipUtil.entriesMap(zipBytes, ZipUtil.XmlParts) // single pass, xml only
    parts.get("meta.xml").foreach { m =>
      DocxExtractor.saxParse(m, new MetaHandler(meta))
    }
    val content = parts.getOrElse("content.xml",
      throw new IllegalArgumentException("no content.xml"))
    DocxExtractor.saxParse(content, new ContentHandlerImpl(sink))
  }

  private final class MetaHandler(meta: MetaSink) extends DefaultHandler {
    private var field: String = null
    private val buf = new StringBuilder
    override def startElement(u: String, l: String, q: String, a: Attributes): Unit =
      if (q == "dc:title" || q == "dc:creator" || q == "dc:subject") {
        field = q; buf.setLength(0)
      }
    override def characters(ch: Array[Char], s: Int, n: Int): Unit =
      if (field != null) buf.appendAll(ch, s, n)
    override def endElement(u: String, l: String, q: String): Unit =
      if (q == field) { meta.set(field, buf.toString.trim); field = null }
  }

  private final class ContentHandlerImpl(sink: SpanSink) extends DefaultHandler {
    private var textDepth = 0  // inside office:text / office:spreadsheet / office:presentation
    private var tableDepth = 0

    override def startElement(u: String, l: String, q: String, a: Attributes): Unit =
      q match {
        case "office:text" | "office:spreadsheet" | "office:presentation" =>
          textDepth += 1
        case "text:tab" => if (textDepth > 0) sink.tab()
        case "text:line-break" => if (textDepth > 0) sink.newline()
        case "text:s" =>
          if (textDepth > 0) {
            val c = Option(a.getValue("text:c")).flatMap(_.toIntOption).getOrElse(1)
            sink.chars(" " * c)
          }
        case "table:table" => tableDepth += 1
        case "table:table-cell" => if (textDepth > 0 && tableDepth > 0) sink.tab()
        case _ => ()
      }

    override def characters(ch: Array[Char], s: Int, n: Int): Unit =
      if (textDepth > 0) sink.chars(new String(ch, s, n))

    override def endElement(u: String, l: String, q: String): Unit =
      q match {
        case "office:text" | "office:spreadsheet" | "office:presentation" =>
          textDepth -= 1
        case "text:p" | "text:h" => if (textDepth > 0) sink.newline()
        case "table:table-row" => if (textDepth > 0) sink.newline()
        case "table:table" => if (tableDepth > 0) { tableDepth -= 1; sink.newline() }
        case _ => ()
      }
  }
}
