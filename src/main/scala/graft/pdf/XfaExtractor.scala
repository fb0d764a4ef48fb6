package graft.pdf

import org.xml.sax.Attributes
import org.xml.sax.helpers.DefaultHandler
import graft.engine.SpanSink

/** XFA form extraction (PDF /AcroForm /XFA packet).
  *
  * Reference semantics: tika-parser-pdf-module
  * `pdf/XFAExtractor.java:55-325` —
  *  - `field` elements in any `http://www.xfa.org/schema/xfa-template*`
  *    namespace are cached in insertion order with their name attribute
  *    and last toolTip text;
  *  - the `{http://www.xfa.org/schema/xfa-data/1.0/}data` subtree is
  *    scraped into a localName → values multimap (text flushed at each
  *    element end, XFAExtractor.loadData);
  *  - standalone `speak|text|contents-richtext|toolTip|exData` elements
  *    stream their text as paragraphs (flushed at inner `</p>` ends);
  *  - finally every named field dumps one line
  *    `displayName: value` where displayName prefers the toolTip and
  *    values come from the data section by field name (empty when
  *    absent), XFAExtractor.extract:124-152.
  *
  * Parsed namespace-aware through [[graft.xmlx.NsSax]] (XFA's
  * template-versioned namespaces need real URIs).
  */
object XfaExtractor {

  private val TemplateNs = "http://www.xfa.org/schema/xfa-template"
  private val DataNs = "http://www.xfa.org/schema/xfa-data/1.0/"
  private val TextPattern = Set("speak", "text", "contents-richtext",
    "toolTip", "exData")

  /** Parse one assembled XFA packet; throws SAXException on malformed
    * XML (the caller falls back to classic AcroForm fields, like
    * AbstractPDF2XHTML.extractAcroForm).
    */
  def extract(xml: Array[Byte], sink: SpanSink): Unit = {
    val fields = scala.collection.mutable.LinkedHashMap[String, String]()
    val values = scala.collection.mutable.LinkedHashMap[String, Vector[String]]()

    val handler = new DefaultHandler {
      private val buf = new StringBuilder
      // capture modes, priority: data > field > standalone text element
      private var inData = false
      private var inField = false
      private var fieldName: String = ""
      private var fieldToolTip: String = ""
      private var inToolTip = false
      private val toolTipBuf = new StringBuilder
      private var textEnd: (String, String) = null // (uri, local) to stop at

      override def startElement(uri: String, local: String, q: String,
          atts: Attributes): Unit = {
        if (inData) return
        if (uri == DataNs && local == "data" && !inField && textEnd == null) {
          inData = true; buf.setLength(0); return
        }
        if (uri.startsWith(TemplateNs) && local == "field") {
          if (!inField && textEnd == null) {
            inField = true
            fieldName = Option(atts.getValue("name")).getOrElse("")
            fieldToolTip = ""
          }
          return
        }
        if (inField) {
          if (local == "toolTip") { inToolTip = true; toolTipBuf.setLength(0) }
          return
        }
        if (textEnd == null && TextPattern.contains(local)) {
          textEnd = (uri, local); buf.setLength(0)
        }
      }

      override def characters(ch: Array[Char], start: Int, len: Int): Unit =
        if (inData || textEnd != null) buf.appendAll(ch, start, len)
        else if (inToolTip) toolTipBuf.appendAll(ch, start, len)

      override def endElement(uri: String, local: String, q: String): Unit = {
        if (inData) {
          // text flushed at every element end keyed by that element
          if (buf.nonEmpty) {
            values(local) = values.getOrElse(local, Vector.empty) :+ buf.toString
            buf.setLength(0)
          }
          if (uri == DataNs && local == "data") inData = false
          return
        }
        if (inField) {
          if (inToolTip && local == "toolTip") {
            inToolTip = false
            fieldToolTip = toolTipBuf.toString
          } else if (inToolTip && local == "p") {
            toolTipBuf.append('\n')
          } else if (uri.startsWith(TemplateNs) && local == "field") {
            if (fieldName != null) fields(fieldName) = fieldToolTip
            inField = false; inToolTip = false
          }
          return
        }
        if (textEnd != null) {
          if ((uri, local) == textEnd) {
            if (buf.toString.trim.nonEmpty) {
              sink.chars(buf.toString.trim); sink.newline()
            }
            buf.setLength(0); textEnd = null
          } else if (local == "p") {
            if (buf.nonEmpty) { sink.chars(buf.toString); sink.newline() }
            buf.setLength(0)
          }
        }
      }
    }

    graft.xmlx.NsSax.parse(xml, handler)

    // dump fields merged with their data values, insertion order
    for ((name, toolTip) <- fields) {
      val display = if (toolTip == null || toolTip.trim.isEmpty) name else toolTip
      val vs = values.getOrElse(name, Vector(""))
      for (v <- vs) { sink.chars(s"$display: $v"); sink.newline() }
    }
  }
}
