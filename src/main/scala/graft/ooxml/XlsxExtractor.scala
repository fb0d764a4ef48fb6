package graft.ooxml

import org.xml.sax.Attributes
import org.xml.sax.helpers.DefaultHandler
import scala.collection.mutable.ArrayBuffer
import graft.engine.{MetaSink, SpanSink}
import graft.zipx.ZipUtil

/** Streaming XLSX text extraction.
  *
  * Reference semantics: tika-parsers .../ooxml/XSSFExcelExtractorDecorator
  * .java (1,376 LoC) + TikaSheetXMLHandler.java (398) — sharedStrings +
  * per-sheet SAX, sheet content rendered as table markup, which under the
  * XHTML serialization rules becomes tab-prefixed cells and newline-
  * terminated rows (XHTMLContentHandler INDENT/ENDLINE sets).
  * Sheets are processed in workbook order (xl/workbook.xml sheet list →
  * relationship targets).
  */
object XlsxExtractor {

  def extract(zipBytes: Array[Byte], sink: SpanSink, meta: MetaSink,
      child: (String, Array[Byte]) => Unit = (_, _) => ()): Unit = {
    val parts = ZipUtil.entriesMap(zipBytes,
      n => ZipUtil.XmlParts(n) || n.contains("/embeddings/"))
    DocxExtractor.embeddedParts(parts, child)
    val shared = sharedStringsFrom(parts)
    val sheets = sheetTargetsFrom(parts)
    val (xfs, customFmts) = XlsxNumFormat.stylesFrom(parts)
    DocxExtractor.corePropsFrom(parts, meta)
    sheets.foreach { case (name, target) =>
      meta.add("sheet:name", name)
      val path =
        if (parts.contains("xl/" + target.stripPrefix("/xl/").stripPrefix("xl/")))
          "xl/" + target.stripPrefix("/xl/").stripPrefix("xl/")
        else target.stripPrefix("/")
      parts.get(path).foreach { bytes =>
        DocxExtractor.saxParse(bytes, new SheetHandler(shared, xfs, customFmts, sink))
        // cell comments render after the table ("author: text" lines)
        val slash = path.lastIndexOf('/')
        val relsPath = path.substring(0, slash + 1) + "_rels/" +
          path.substring(slash + 1) + ".rels"
        for (rel <- XlsxDrawings.relsOf(parts, relsPath)
            if rel.tpe.endsWith("/comments")) {
          val cPath = if (rel.target.startsWith("/")) rel.target.substring(1)
            else "xl/" + rel.target.stripPrefix("../")
          parts.get(cPath).foreach(c =>
            XlsxComments.emit(XlsxComments.fromXml(c), sink))
        }
        // shape/diagram/chart text from the sheet's drawing parts
        XlsxDrawings.processSheet(parts, path, sink, meta)
        sink.newline() // sheet (table) end
      }
    }
  }

  /** xl/sharedStrings.xml → indexed string pool. */
  def sharedStringsFrom(parts: Map[String, Array[Byte]]): Vector[String] = {
    parts.get("xl/sharedStrings.xml").map { bytes =>
      val out = new ArrayBuffer[String]()
      val buf = new StringBuilder
      var inSi = false
      var inT = false
      DocxExtractor.saxParse(bytes, new DefaultHandler {
        override def startElement(u: String, l: String, q: String, a: Attributes): Unit =
          localName(q) match {
            case "si" => inSi = true; buf.setLength(0)
            case "t" => inT = true
            case _ => ()
          }
        override def characters(ch: Array[Char], s: Int, n: Int): Unit =
          if (inSi && inT) buf.appendAll(ch, s, n)
        override def endElement(u: String, l: String, q: String): Unit =
          localName(q) match {
            case "si" => inSi = false; out += buf.toString
            case "t" => inT = false
            case _ => ()
          }
      })
      out.toVector
    }.getOrElse(Vector.empty)
  }

  /** workbook.xml sheet order + workbook rels → (name, worksheet target). */
  def sheetTargetsFrom(parts: Map[String, Array[Byte]]): Vector[(String, String)] = {
    val rels = parts.get("xl/_rels/workbook.xml.rels")
      .map(DocxExtractor.parseRels).getOrElse(Map.empty)
    parts.get("xl/workbook.xml").map { bytes =>
      val out = new ArrayBuffer[(String, String)]()
      DocxExtractor.saxParse(bytes, new DefaultHandler {
        override def startElement(u: String, l: String, q: String, a: Attributes): Unit =
          if (localName(q) == "sheet") {
            val name = Option(a.getValue("name")).getOrElse("")
            var rid: String = null
            var i = 0
            while (i < a.getLength && rid == null) {
              if (a.getQName(i).endsWith("id")) rid = a.getValue(i)
              i += 1
            }
            Option(rid).flatMap(rels.get).foreach(t => out += ((name, t)))
          }
      })
      out.toVector
    }.getOrElse(Vector.empty)
  }

  private def localName(q: String): String = q.substring(q.indexOf(':') + 1)

  /** Sheet XML → cells/rows (TikaSheetXMLHandler analog). Numeric cells
    * format through the style table like the reference's DataFormatter
    * route (XSSFExcelExtractorDecorator.java — round-3 verdict item #5).
    */
  private final class SheetHandler(shared: Vector[String], xfs: Vector[Int],
      customFmts: Map[Int, String], sink: SpanSink)
      extends DefaultHandler {
    private var cellType: String = null
    private var styleIdx = -1
    private var inV = false
    private var inIsT = false
    private val v = new StringBuilder

    override def startElement(u: String, l: String, q: String, a: Attributes): Unit =
      localName(q) match {
        case "c" =>
          cellType = Option(a.getValue("t")).getOrElse("n")
          styleIdx = Option(a.getValue("s")).flatMap(_.toIntOption).getOrElse(-1)
        case "v" => inV = true; v.setLength(0)
        case "t" => if (cellType == "inlineStr") { inIsT = true; v.setLength(0) }
        case _ => ()
      }

    override def characters(ch: Array[Char], s: Int, n: Int): Unit =
      if (inV || inIsT) v.appendAll(ch, s, n)

    private def fmtCode: String = {
      val numFmtId = if (styleIdx >= 0 && styleIdx < xfs.length) xfs(styleIdx) else 0
      if (numFmtId == 0) "General"
      else customFmts.getOrElse(numFmtId,
        XlsxNumFormat.Builtin.getOrElse(numFmtId, "General"))
    }

    override def endElement(u: String, l: String, q: String): Unit =
      localName(q) match {
        case "v" | "t" if inV || inIsT =>
          val raw = v.toString
          val text = cellType match {
            case "s" => raw.toIntOption.flatMap(shared.lift).getOrElse(raw)
            case "b" => if (raw == "1") "TRUE" else "FALSE"
            case "n" => XlsxNumFormat.format(raw, fmtCode)
            case _ => raw
          }
          sink.tab()      // td INDENT
          sink.chars(text)
          inV = false; inIsT = false
        case "row" => sink.newline() // tr ENDLINE
        case _ => ()
      }
  }
}

/** Streaming PPTX text extraction.
  *
  * Reference: tika-parsers .../ooxml/SXSLFPowerPointExtractorDecorator —
  * slides in presentation order (ppt/presentation.xml sldIdLst →
  * relationship targets), DrawingML `a:t` runs, paragraph (`a:p`) end →
  * newline; slide end → newline.
  */
object PptxExtractor {

  def extract(zipBytes: Array[Byte], sink: SpanSink, meta: MetaSink,
      child: (String, Array[Byte]) => Unit = (_, _) => ()): Unit = {
    val parts = ZipUtil.entriesMap(zipBytes,
      n => ZipUtil.XmlParts(n) || n.contains("/embeddings/"))
    DocxExtractor.embeddedParts(parts, child)
    DocxExtractor.corePropsFrom(parts, meta)
    slideTargetsFrom(parts).foreach { target =>
      val path = if (target.startsWith("/")) target.substring(1) else "ppt/" + target
      parts.get(path).foreach { bytes =>
        DocxExtractor.saxParse(bytes, new SlideHandler(sink))
        // speaker notes follow their slide (OfficeParserConfig
        // includeSlideNotes defaults true in the reference)
        val slash = path.lastIndexOf('/')
        val relsPath = path.substring(0, slash + 1) + "_rels/" +
          path.substring(slash + 1) + ".rels"
        for (rel <- XlsxDrawings.relsOf(parts, relsPath)
            if rel.tpe.endsWith("/notesSlide")) {
          val nPath =
            if (rel.target.startsWith("/")) rel.target.substring(1)
            else "ppt/" + rel.target.stripPrefix("../")
          parts.get(nPath).foreach { nb =>
            DocxExtractor.saxParse(nb, new SlideHandler(sink))
          }
        }
        sink.newline() // slide end
      }
    }
  }

  def slideTargetsFrom(parts: Map[String, Array[Byte]]): Vector[String] = {
    val rels = parts.get("ppt/_rels/presentation.xml.rels")
      .map(DocxExtractor.parseRels).getOrElse(Map.empty)
    parts.get("ppt/presentation.xml").map { bytes =>
      val out = new ArrayBuffer[String]()
      DocxExtractor.saxParse(bytes, new org.xml.sax.helpers.DefaultHandler {
        override def startElement(u: String, l: String, q: String,
            a: Attributes): Unit =
          if (q.endsWith("sldId")) {
            var i = 0
            while (i < a.getLength) {
              if (a.getQName(i).endsWith(":id") &&
                  a.getQName(i).startsWith("r")) {
                rels.get(a.getValue(i)).foreach(out += _)
              }
              i += 1
            }
          }
      })
      out.toVector
    }.getOrElse(Vector.empty)
  }

  private final class SlideHandler(sink: SpanSink) extends DefaultHandler {
    private var inT = false
    override def startElement(u: String, l: String, q: String, a: Attributes): Unit =
      if (q == "a:t") inT = true
    override def characters(ch: Array[Char], s: Int, n: Int): Unit =
      if (inT) sink.chars(new String(ch, s, n))
    override def endElement(u: String, l: String, q: String): Unit = {
      if (q == "a:t") inT = false
      else if (q == "a:p") sink.newline()
    }
  }
}
