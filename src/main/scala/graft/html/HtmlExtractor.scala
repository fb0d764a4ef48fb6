package graft.html

import java.net.URI
import graft.engine.{MetaSink, SpanSink}

/** Element classification tables.
  *
  * Reference: tika-parsers .../html/DefaultHtmlMapper.java — ~30
  * SAFE_ELEMENTS (:38-82), DISCARDABLE = {STYLE, SCRIPT} (:83-86); and
  * tika-core sax/XHTMLContentHandler.java — ENDLINE newline set (:46-49)
  * and INDENT tab set (:71-72).
  */
object HtmlTables {
  val Discardable: Set[String] = Set("style", "script")

  /** Elements after whose END a '\n' is emitted (XHTMLContentHandler:46-49). */
  val EndLine: Set[String] = Set(
    "p", "h1", "h2", "h3", "h4", "h5", "h6", "div", "ul", "ol", "dl",
    "pre", "hr", "blockquote", "address", "fieldset", "table", "form",
    "noscript", "li", "dt", "dd", "noframes", "br", "tr", "select", "option"
  )

  /** Elements before whose START a '\t' is emitted (XHTMLContentHandler:71-72). */
  val Indent: Set[String] = Set("li", "dd", "dt", "td", "th", "frame")

  /** Head-scoped elements (content routed to metadata, not body text). */
  val HeadOnly: Set[String] = Set("head", "title", "meta", "link", "base")

  /** Void elements (never hold content). */
  val Void: Set[String] = Set(
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr"
  )
}

/** Per-document HTML extraction result. */
final case class HtmlResult(limitHit: Boolean)

/** Port of the reference's boilerplate-strip state machine.
  *
  * Reference: tika-parsers .../html/HtmlHandler.java:55-482 —
  *  - counters bodyLevel/discardLevel/titleLevel/scriptLevel (:81-85);
  *  - characters pass only when bodyLevel>0 && discardLevel==0 (:426-437);
  *  - <meta> → metadata incl. ICBM geo (:190-236,198-208), title
  *    precedence (:224-228);
  *  - <base href> sets the resolution base (:150-153);
  *  - relative URL resolution for src/href (resolve, :446-480);
  *  - block-end newline / cell tab via XHTMLContentHandler rules.
  *
  * Our jsoup-free simplification: a document without an explicit <body>
  * starts the body implicitly at the first non-head-only element or text
  * (what jsoup's tree builder would synthesize).
  */
object HtmlExtractor {

  import HtmlTables._

  def extract(html: String, sink: SpanSink, meta: MetaSink): HtmlResult =
    extract(html, sink, meta, (_, _) => ())

  /** `onEmbedded(nameHint, bytes)` receives `data:` URI payloads and
    * `<iframe srcdoc>` fragments (HtmlHandler.java:355-380,337-353 makes
    * both embedded documents).
    */
  def extract(html: String, sink: SpanSink, meta: MetaSink,
      onEmbedded: (Option[String], Array[Byte]) => Unit): HtmlResult = {
    val tokens = HtmlTokenizer.tokenize(html)
    var bodyLevel = 0
    var discardLevel = 0
    var titleLevel = 0
    var headLevel = 0
    var sawExplicitBody = false
    var implicitBody = false
    var base: Option[URI] = None
    val title = new StringBuilder

    def inBody: Boolean = (bodyLevel > 0 || implicitBody) && discardLevel == 0 && headLevel == 0

    def resolve(url: String): String = {
      if (url == null || url.isEmpty) url
      else base match {
        case Some(b) =>
          try b.resolve(url.trim.replace(" ", "%20")).toString
          catch { case _: Exception => url }
        case None => url
      }
    }

    def maybeImplicitBody(name: String): Unit = {
      if (!sawExplicitBody && bodyLevel == 0 && headLevel == 0 &&
          !HeadOnly.contains(name) && name != "html" && !Discardable.contains(name))
        implicitBody = true
    }

    def handleMeta(tag: StartTag): Unit = {
      val name = tag.attr("name").orElse(tag.attr("http-equiv"))
      val content = tag.attr("content")
      tag.attr("charset").foreach(cs => meta.set("Content-Encoding", cs))
      (name, content) match {
        case (Some(n), Some(c)) =>
          val key = n.trim
          // ICBM geo → latitude/longitude (HtmlHandler.java:198-208)
          if (key.equalsIgnoreCase("ICBM") || key.equalsIgnoreCase("geo.position")) {
            val parts = c.split("[,;]").map(_.trim)
            if (parts.length == 2) {
              meta.set("geo:lat", parts(0))
              meta.set("geo:long", parts(1))
            }
            meta.add(key, c)
          } else if (key.equalsIgnoreCase("content-type")) {
            val m = java.util.regex.Pattern.compile("(?i)charset=([\\w.:-]+)").matcher(c)
            if (m.find()) meta.set("Content-Encoding", m.group(1))
          } else if (key.equalsIgnoreCase("title")) {
            // title precedence (HtmlHandler.java:224-228): the <title>
            // element wins over <meta name=title>; stash separately and
            // promote at end-of-document only if no element title
            meta.set("meta:title-candidate", c)
          } else meta.add(key, c)
        case _ => ()
      }
    }

    val it = tokens.iterator
    while (it.hasNext) {
      it.next() match {
        case tag @ StartTag(name, _, selfClosing) =>
          maybeImplicitBody(name)
          name match {
            case "body" => sawExplicitBody = true; bodyLevel += 1
            case "head" => headLevel += 1
            case "title" => if (bodyLevel == 0) titleLevel += 1
            case "base" =>
              tag.attr("href").foreach { h =>
                try { base = Some(new URI(h.trim)) } catch { case _: Exception => () }
                meta.set("Content-Location", h.trim)
              }
            case "meta" => handleMeta(tag)
            case "img" =>
              if (inBody) {
                val src = tag.attr("src").getOrElse("")
                if (src.startsWith("data:")) {
                  // data: URI payloads become embedded docs (:355-380)
                  decodeDataUri(src).foreach(bytes => onEmbedded(None, bytes))
                } else if (src.nonEmpty) sink.media(resolve(src))
              }
            case "a" =>
              tag.attr("href").foreach(h => if (inBody) meta.add("links", resolve(h)))
            case "frame" | "iframe" =>
              // <iframe srcdoc> is an inline embedded HTML doc (:337-353)
              tag.attr("srcdoc") match {
                case Some(doc) if inBody =>
                  onEmbedded(Some("srcdoc.html"),
                    doc.getBytes(java.nio.charset.StandardCharsets.UTF_8))
                case _ =>
                  tag.attr("src").foreach(h => if (inBody) meta.add("links", resolve(h)))
              }
            case n if Discardable.contains(n) => if (!selfClosing) discardLevel += 1
            case _ => ()
          }
          if (inBody && Indent.contains(name)) sink.tab()
          // <br> is a void ENDLINE element: newline at start
          if (inBody && name == "br") sink.newline()
          if (selfClosing && Discardable.contains(name)) () // not opened

        case EndTag(name) =>
          name match {
            case "body" => if (bodyLevel > 0) bodyLevel -= 1
            case "head" => if (headLevel > 0) headLevel -= 1
            case "title" =>
              if (titleLevel > 0) {
                titleLevel -= 1
                if (titleLevel == 0 && title.nonEmpty && !meta.contains("title"))
                  meta.set("title", title.toString.trim)
              }
            case n if Discardable.contains(n) => if (discardLevel > 0) discardLevel -= 1
            case _ => ()
          }
          if (inBody && name != "br" && EndLine.contains(name)) sink.newline()

        case TextRun(text) =>
          if (titleLevel > 0 && discardLevel == 0) title.append(text)
          else if (inBody) sink.chars(text)
          else if (bodyLevel == 0 && headLevel == 0 && discardLevel == 0 &&
                   titleLevel == 0 && text.trim.nonEmpty) {
            // bare text outside <body> — before any structure OR after an
            // explicit </body> (jsoup hoists trailing text into the body,
            // so the reference emits it; common in sloppy real HTML)
            implicitBody = true
            sink.chars(text)
          }
      }
    }
    sink.flushText()
    // title precedence: element title wins; promote the meta candidate
    // only when no <title> was seen (HtmlHandler.java:224-228)
    val candidate = meta.remove("meta:title-candidate")
    if (!meta.contains("title")) candidate.foreach(meta.set("title", _))
    HtmlResult(sink.limitReached)
  }

  /** data:[mime][;base64],payload → raw bytes. */
  def decodeDataUri(uri: String): Option[Array[Byte]] = {
    val comma = uri.indexOf(',')
    if (comma < 0) None
    else {
      val header = uri.substring(5, comma)
      val payload = uri.substring(comma + 1)
      try {
        if (header.endsWith(";base64"))
          Some(java.util.Base64.getMimeDecoder.decode(payload))
        else
          Some(java.net.URLDecoder.decode(payload, "UTF-8")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      } catch { case _: Exception => None }
    }
  }

}
