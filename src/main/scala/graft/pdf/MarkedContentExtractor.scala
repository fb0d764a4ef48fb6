package graft.pdf

import scala.collection.mutable

import graft.engine.SpanSink

/** Per-page marked-content text collector: BDC/BMC push, EMC pops, shown
  * text attributes to the innermost marked content carrying an MCID (or
  * the page's -1 catch-all when none does — header/footer Artifacts land
  * there). Text drawn entirely outside marked content is dropped, like
  * PDFBox's PDFMarkedContentExtractor whose stack-empty case ignores the
  * TextPosition.
  */
private[pdf] final class McCollector {
  private val stack = mutable.ArrayBuffer[(String, Int)]() // (tag, mcid)
  val text = mutable.LinkedHashMap[Int, StringBuilder]()   // mcid → chars
  val tagOf = mutable.Map[Int, String]()                    // mcid → BDC tag

  // -1 chunks from DIFFERENT marked contents join with '\n'
  // (loadTextByMCID: paragraphs.get(mcid) + "\n" + p for mcid -1)
  private var runCounter = 0
  private var lastMinus1Run = -1

  def begin(tag: String, mcid: Int): Unit = {
    runCounter += 1
    stack += ((tag, mcid))
    if (mcid >= 0 && !tagOf.contains(mcid)) tagOf(mcid) = tag
  }

  def end(): Unit = if (stack.nonEmpty) stack.remove(stack.size - 1)

  def append(s: String): Unit = {
    if (stack.isEmpty) return
    var i = stack.size - 1
    var mcid = -1
    while (i >= 0 && mcid < 0) { mcid = stack(i)._2; i -= 1 }
    val buf = text.getOrElseUpdate(mcid, new StringBuilder)
    if (mcid == -1) {
      if (buf.nonEmpty && lastMinus1Run != runCounter) buf.append('\n')
      lastMinus1Run = runCounter
    }
    buf.append(s)
  }
}

/** Tagged-PDF logical-order extraction: walks /StructTreeRoot and emits
  * text in structure order with the reference's structure-type → HTML
  * mapping flattened to the engine's span serialization (newline after
  * block elements, tab before table cells / list items). Reference
  * behavior (NOT code): PDFMarkedContent2XHTML.java — COMMON_TAG_MAP,
  * RoleMap resolution to known tags or div+class, span/LBody
  * suppression, Link anchors gathered through OBJR → /A → /URI, orphan
  * MCIDs dumped as trailing paragraphs.
  */
object MarkedContentExtractor {

  private val MaxDepth = 1000

  // structure types with a direct HTML analog (COMMON_TAG_MAP); all
  // lower-case — everything else renders as div+class
  private val CommonTags: Map[String, String] = Map(
    "document" -> "body", "div" -> "div", "p" -> "p", "span" -> "span",
    "table" -> "table", "thead" -> "thead", "tbody" -> "tbody",
    "tr" -> "tr", "th" -> "th", "td" -> "td", "l" -> "ul", "li" -> "li",
    "h1" -> "h1", "h2" -> "h2", "h3" -> "h3", "h4" -> "h4", "h5" -> "h5",
    "h6" -> "h6")

  // XHTMLContentHandler serialization classes (flattened): '\n' after
  // these block elements, '\t' before the indented ones
  private val EndLine: Set[String] = Set("body", "p", "div", "h1", "h2",
    "h3", "h4", "h5", "h6", "ul", "li", "table", "tr")
  private val Indent: Set[String] = Set("li", "td", "th")

  private final case class Tag(tag: String, clazz: String)

  /** Extract in logical (structure-tree) order. Returns false when the
    * document has no usable structure tree — the caller falls back to
    * classic positional extraction.
    */
  def extract(doc: PdfDoc, sink: SpanSink): Boolean = {
    val structRoot = (for {
      cat <- doc.catalog
      sr <- doc.dict(cat.get("StructTreeRoot").getOrElse(PNull))
    } yield sr).getOrElse(return false)
    val kids = structRoot.get("K").getOrElse(return false)

    val pages = doc.pagesWithRefs
    if (pages.isEmpty) return false

    // role map: custom structure type → standard type; a target with a
    // known HTML analog maps to it, anything else becomes div+class
    val roleMap: mutable.Map[String, Tag] = mutable.Map.empty
    for {
      rm <- doc.dict(structRoot.get("RoleMap").getOrElse(PNull))
      (k, v) <- rm.entries
    } doc.resolve(v) match {
      case PName(target) =>
        val lc = target.toLowerCase(java.util.Locale.ROOT)
        roleMap(k) =
          if (CommonTags.values.exists(_ == lc)) Tag(lc, "")
          else Tag("div", lc)
      case _ => ()
    }

    // STEP 1+3: per-page MCID → text via the collector pass
    val paragraphs = mutable.Map[(Int, Int), String]()
    val pageOrder = mutable.Map[Int, Int]()
    for (((pageRef, page), idx) <- pages.zipWithIndex) {
      pageOrder(pageRef) = idx
      val col = new McCollector
      try PdfExtractor.interpretPage(doc, doc.pageContent(page),
        doc.pageResources(page), sink, 0, col)
      catch { case _: PdfParseException => () }
      for ((mcid, buf) <- col.text) {
        var s = buf.toString
        if (mcid >= 0 && col.tagOf.getOrElse(mcid, "") == "P") s = s.trim
        paragraphs((pageRef, mcid)) = s
      }
    }
    if (paragraphs.isEmpty) return false

    // STEP 4: structure-tree recursion
    val processed = mutable.Set[(Int, Int)]()
    var inLink = false
    var linkUri: String = null
    val linkBuf = new StringBuilder

    def getTag(name: String): Tag =
      roleMap.getOrElse(name, {
        val lc = name.toLowerCase(java.util.Locale.ROOT)
        CommonTags.get(lc).map(Tag(_, "")).getOrElse(Tag("div", lc))
      })

    def writeLink(): Unit = {
      // flattened <a href>: emit the gathered anchor text (the href is
      // an attribute in the reference's XHTML — no span analog)
      if (linkBuf.nonEmpty) sink.chars(linkBuf.toString)
      linkBuf.setLength(0)
      inLink = false
      linkUri = null
    }

    // indirect refs on the CURRENT recursion path: a structure tree is
    // acyclic, so a ref already on the path is a malformed cycle
    // (N = [N 0 R]) — skip it instead of recursing to stack overflow.
    // A plain depth cap can't do this: cutting off at MaxDepth levels
    // still burns MaxDepth × (several JVM frames) of stack.
    val onPath = mutable.Set[Int]()

    def recurse(node: PdfObj, pageRef0: Int, depth: Int): Unit = {
      if (depth > MaxDepth) return
      node match {
        case PRef(num, _) =>
          if (!onPath.add(num)) return
          try recurse(doc.resolve(node), pageRef0, depth + 1)
          finally onPath.remove(num)
          return
        case _ => ()
      }
      var pageRef = pageRef0
      doc.resolve(node) match {
        case PArr(items) => items.foreach(recurse(_, pageRef, depth + 1))
        case PNum(n) =>
          val key = (pageRef, n.toInt)
          paragraphs.get(key).foreach { s =>
            if (inLink) linkBuf.append(s)
            else sink.chars(s)
            processed += key
          }
        case d: PDict =>
          val tpe = doc.resolve(d.get("Type").getOrElse(PNull)) match {
            case PName(t) => t
            case _ => ""
          }
          if (tpe == "OBJR") {
            // object reference: the target is usually a link annotation
            recurse(d.get("Obj").getOrElse(PNull), pageRef, depth + 1)
            return
          }
          if (tpe == "MCR") {
            val pg = d.get("Pg") match {
              case Some(PRef(n, _)) => n
              case _ => pageRef
            }
            doc.resolve(d.get("MCID").getOrElse(PNull)) match {
              case PNum(n) =>
                val key = (pg, n.toInt)
                paragraphs.get(key).foreach { s =>
                  if (inLink) linkBuf.append(s) else sink.chars(s)
                  processed += key
                }
              case _ => ()
            }
            return
          }
          // a bare annotation dict reached through OBJR: /A → /URI
          val action = doc.dict(d.get("A").getOrElse(PNull))
          if (action.isDefined && d.get("S").isEmpty) {
            action.flatMap(a =>
              doc.resolve(a.get("URI").getOrElse(PNull)) match {
                case PStr(b) => Some(new String(b,
                  java.nio.charset.StandardCharsets.ISO_8859_1))
                case _ => None
              }).foreach(linkUri = _)
            return
          }
          val name = doc.resolve(d.get("S").getOrElse(PNull)) match {
            case PName(s) => s
            case _ => ""
          }
          val grandkids = d.get("K") match {
            case Some(k) => k
            case None => return
          }
          d.get("Pg") match {
            case Some(PRef(n, _)) => pageRef = n
            case _ => ()
          }
          val tag = getTag(name)
          var startedLink = false
          var ignoreTag = false
          if (tag.clazz == "link") {
            inLink = true
            startedLink = true
          }
          if (!inLink || startedLink) {
            if (!startedLink) {
              if (tag.tag == "span") ignoreTag = true
              else if (tag.clazz == "lbody") ignoreTag = true
              if (!ignoreTag && Indent.contains(tag.tag)) sink.tab()
            }
          }
          recurse(grandkids, pageRef, depth + 1)
          if (startedLink) writeLink()
          if (!inLink && !startedLink && !ignoreTag &&
              EndLine.contains(tag.tag))
            sink.newline()
        case _ => ()
      }
    }

    recurse(kids, -1, 0)

    // STEP 5: leftovers — an unterminated link anchor, then any MCID the
    // tree never referenced (page order, then mcid, for determinism; the
    // reference iterates a HashMap here)
    if (linkBuf.nonEmpty) {
      sink.chars(linkBuf.toString)
      linkBuf.setLength(0)
      sink.newline()
    }
    val orphans = paragraphs.keys.filterNot(processed).toSeq
      .sortBy { case (pg, mcid) => (pageOrder.getOrElse(pg, Int.MaxValue), mcid) }
    for (key <- orphans) {
      val s = paragraphs(key)
      if (s.nonEmpty) {
        sink.chars(s)
        sink.newline()
      }
    }
    true
  }
}
