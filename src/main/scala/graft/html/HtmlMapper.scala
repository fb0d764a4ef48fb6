package graft.html

/** Pluggable element/attribute mapping strategy — the reference's
  * HtmlMapper interface (tika-parsers .../html/HtmlMapper.java) with
  * both shipped strategies:
  *
  *  - [[DefaultMapper]]: the XHTML-strict whitelists from
  *    DefaultHtmlMapper.java:38-113 (safe elements, STYLE/SCRIPT
  *    discard, per-element safe attributes) — unmapped markup
  *    contributes no bytes, text passes through;
  *  - [[IdentityMapper]]: markup-preserving mode
  *    (IdentityHtmlMapper.java) — every element and attribute survives,
  *    names lower-cased.
  */
trait HtmlMapper extends Serializable {
  /** Mapped (lowercase) output element name, or None to drop the tags. */
  def mapSafeElement(name: String): Option[String]
  def isDiscardElement(name: String): Boolean
  /** Keep attribute `att` on (mapped) element `elem`? */
  def mapSafeAttribute(elem: String, att: String): Boolean
}

object DefaultMapper extends HtmlMapper {
  /** DefaultHtmlMapper.SAFE_ELEMENTS (:38-82); MENU renames to ul. */
  private val Safe: Map[String, String] = Map(
    "h1" -> "h1", "h2" -> "h2", "h3" -> "h3", "h4" -> "h4", "h5" -> "h5",
    "h6" -> "h6",
    "p" -> "p", "pre" -> "pre", "blockquote" -> "blockquote", "q" -> "q",
    "ul" -> "ul", "ol" -> "ol", "menu" -> "ul", "li" -> "li",
    "dl" -> "dl", "dt" -> "dt", "dd" -> "dd",
    "table" -> "table", "thead" -> "thead", "tbody" -> "tbody",
    "tr" -> "tr", "th" -> "th", "td" -> "td",
    "address" -> "address",
    "a" -> "a",
    "map" -> "map", "area" -> "area", "img" -> "img",
    "frameset" -> "frameset", "frame" -> "frame", "iframe" -> "iframe",
    "object" -> "object", "param" -> "param", "ins" -> "ins", "del" -> "del")

  /** DefaultHtmlMapper.SAFE_ATTRIBUTES (:90-113). */
  private val SafeAttrs: Map[String, Set[String]] = Map(
    "a" -> Set("charset", "type", "name", "href", "hreflang", "rel", "rev",
      "shape", "coords"),
    "img" -> Set("src", "alt", "longdesc", "height", "width", "usemap", "ismap"),
    "frame" -> Set("longdesc", "name", "src", "frameborder", "marginwidth",
      "marginheight", "noresize", "scrolling"),
    "iframe" -> Set("longdesc", "name", "src", "frameborder", "marginwidth",
      "marginheight", "scrolling", "align", "height", "width"),
    "link" -> Set("charset", "href", "hreflang", "type", "rel", "rev", "media"),
    "map" -> Set("id", "class", "style", "title", "name"),
    "area" -> Set("shape", "coords", "href", "nohref", "alt"),
    "object" -> Set("declare", "classid", "codebase", "data", "type",
      "codetype", "archive", "standby", "height", "width", "usemap", "name",
      "tabindex", "align", "border", "hspace", "vspace"),
    "param" -> Set("id", "name", "value", "valuetype", "type"),
    "blockquote" -> Set("cite"),
    "ins" -> Set("cite", "datetime"),
    "del" -> Set("cite", "datetime"),
    "q" -> Set("cite"))

  def mapSafeElement(name: String): Option[String] = Safe.get(name)
  def isDiscardElement(name: String): Boolean = name == "style" || name == "script"
  def mapSafeAttribute(elem: String, att: String): Boolean =
    SafeAttrs.get(elem).exists(_.contains(att))
}

/** Markup-preserving mode (IdentityHtmlMapper.java): everything maps. */
object IdentityMapper extends HtmlMapper {
  def mapSafeElement(name: String): Option[String] = Some(name)
  def isDiscardElement(name: String): Boolean = false
  def mapSafeAttribute(elem: String, att: String): Boolean = true
}

/** Mapped XHTML serialization over the tokenizer stream: whitelisted
  * elements survive as markup, everything else contributes only its
  * text (SURVEY.md §7 hard-part note: the safe-element whitelist fully
  * determines HTML output markup — TextContentHandler semantics).
  */
object MappedXhtml {

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
  private def escAttr(s: String): String = esc(s).replace("\"", "&quot;")

  def serialize(html: String, mapper: HtmlMapper): String = {
    val out = new StringBuilder
    var discard = 0
    // open-element stack of (source name, emitted mapped name): end tags
    // close BY NAME — sloppy HTML omits </li>/</p> and stray end tags
    // must not close an unrelated element (that produced malformed
    // XHTML from a serializer whose contract is strict output).
    // openCounts answers the is-this-name-open membership test in O(1);
    // a per-end-tag stack scan would be O(n²) on hostile input with no
    // sink call to trip the per-doc deadline.
    val open = scala.collection.mutable.Stack[(String, Option[String])]()
    val openCounts = scala.collection.mutable.Map.empty[String, Int]
    def closeTop(): Unit = {
      val (nm, mapped) = open.pop()
      val c = openCounts.getOrElse(nm, 1)
      if (c <= 1) openCounts.remove(nm) else openCounts(nm) = c - 1
      mapped.foreach(m => out.append("</").append(m).append('>'))
    }
    HtmlTokenizer.tokenize(html).foreach {
      case StartTag(name, attrs, selfClosing) =>
        if (mapper.isDiscardElement(name)) {
          if (!selfClosing) discard += 1
        } else if (discard == 0) {
          val mapped = mapper.mapSafeElement(name)
          mapped.foreach { m =>
            out.append('<').append(m)
            attrs.foreach { case (k, v) =>
              if (mapper.mapSafeAttribute(m, k))
                out.append(' ').append(k).append("=\"").append(escAttr(v)).append('"')
            }
            if (selfClosing || HtmlTables.Void.contains(name)) out.append("/>")
            else out.append('>')
          }
          if (!selfClosing && !HtmlTables.Void.contains(name)) {
            open.push((name, mapped))
            openCounts(name) = openCounts.getOrElse(name, 0) + 1
          }
        }
      case EndTag(name) =>
        if (mapper.isDiscardElement(name)) { if (discard > 0) discard -= 1 }
        else if (discard == 0 && !HtmlTables.Void.contains(name)) {
          if (openCounts.contains(name)) {
            // implicitly close unclosed children, then the element itself
            while (open.top._1 != name) closeTop()
            closeTop()
          } // stray end tag with no matching open element: ignored
        }
      case TextRun(text) =>
        if (discard == 0) out.append(esc(text))
    }
    while (open.nonEmpty) closeTop() // EOF closes what the input left open
    out.toString
  }
}
