package graft.html

import scala.collection.mutable.ArrayBuffer

/** Token stream of an HTML document. */
sealed trait HtmlToken
final case class StartTag(name: String, attrs: Vector[(String, String)], selfClosing: Boolean)
    extends HtmlToken {
  def attr(key: String): Option[String] =
    attrs.collectFirst { case (k, v) if k == key => v }
}
final case class EndTag(name: String) extends HtmlToken
final case class TextRun(text: String) extends HtmlToken

/** From-scratch HTML tokenizer (quirks-tolerant).
  *
  * Replaces the reference's jsoup dependency
  * (tika-parsers .../html/JSoupParser.java:160-220 parses with jsoup in
  * quirks mode then walks the DOM). We tokenize and feed the
  * [[HtmlExtractor]] state machine directly — for text/metadata
  * extraction the intermediate DOM adds nothing.
  *
  * Handles: doctype, comments (incl. bogus), CDATA, rawtext elements
  * (script/style — content swallowed verbatim until the matching close
  * tag, as HTML5 rawtext states do), attribute quoting styles, entity
  * decoding in text and attribute values.
  */
object HtmlTokenizer {

  private val RawTextElements = Set("script", "style")
  /** RCDATA elements: content runs to the matching close tag with
    * entities decoded but no tag parsing (HTML5 RCDATA state) — a '<'
    * inside <title> or <textarea> is character data.
    */
  private val RcdataElements = Set("title", "textarea")

  def tokenize(html: String): Vector[HtmlToken] = {
    val out = new ArrayBuffer[HtmlToken]()
    val n = html.length
    var i = 0
    val text = new StringBuilder

    def flushText(): Unit = {
      if (text.nonEmpty) { out += TextRun(Entities.decode(text.toString)); text.setLength(0) }
    }

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<' && i + 1 < n) {
        val c1 = html.charAt(i + 1)
        if (c1 == '!') {
          flushText()
          if (html.startsWith("<!--", i)) {
            val e = html.indexOf("-->", i + 4)
            i = if (e < 0) n else e + 3
          } else if (html.regionMatches(true, i, "<![CDATA[", 0, 9)) {
            val e = html.indexOf("]]>", i + 9)
            val end = if (e < 0) n else e
            text.append(html.substring(i + 9, end))
            flushText()
            i = if (e < 0) n else e + 3
          } else { // doctype / bogus comment
            val e = html.indexOf('>', i + 2)
            i = if (e < 0) n else e + 1
          }
        } else if (c1 == '?') { // processing instruction → bogus comment
          flushText()
          val e = html.indexOf('>', i + 2)
          i = if (e < 0) n else e + 1
        } else if (c1 == '/') {
          flushText()
          val (name, next) = readTagName(html, i + 2)
          val e = html.indexOf('>', next)
          i = if (e < 0) n else e + 1
          if (name.nonEmpty) out += EndTag(name)
        } else if (Character.isLetter(c1)) {
          flushText()
          val (tag, next) = readStartTag(html, i)
          i = next
          out += tag
          if (RawTextElements.contains(tag.name) && !tag.selfClosing) {
            // rawtext: swallow until matching close tag
            val close = findCloseTag(html, i, tag.name)
            val raw = html.substring(i, close._1)
            out += TextRun(raw) // NOT entity-decoded (rawtext state)
            if (close._2 > close._1) out += EndTag(tag.name)
            i = close._2
          } else if (RcdataElements.contains(tag.name) && !tag.selfClosing) {
            val close = findCloseTag(html, i, tag.name)
            out += TextRun(Entities.decode(html.substring(i, close._1)))
            if (close._2 > close._1) out += EndTag(tag.name)
            i = close._2
          }
        } else {
          text.append(c); i += 1
        }
      } else {
        text.append(c); i += 1
      }
    }
    flushText()
    out.toVector
  }

  private def readTagName(s: String, start: Int): (String, Int) = {
    var i = start
    val n = s.length
    val b = new StringBuilder
    while (i < n && (Character.isLetterOrDigit(s.charAt(i)) || s.charAt(i) == ':' ||
           s.charAt(i) == '-' || s.charAt(i) == '_')) {
      b.append(Character.toLowerCase(s.charAt(i))); i += 1
    }
    // strip namespace prefix (XHTMLDowngradeHandler normalization)
    val name = b.toString
    (name.substring(name.indexOf(':') + 1), i)
  }

  private def readStartTag(s: String, start: Int): (StartTag, Int) = {
    val n = s.length
    val (name, afterName) = readTagName(s, start + 1)
    var i = afterName
    val attrs = new ArrayBuffer[(String, String)]()
    var selfClosing = false
    var done = false
    while (!done && i < n) {
      while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
      if (i >= n) done = true
      else s.charAt(i) match {
        case '>' => i += 1; done = true
        case '/' =>
          if (i + 1 < n && s.charAt(i + 1) == '>') { selfClosing = true; i += 2; done = true }
          else i += 1
        case _ =>
          // attribute name
          val an = new StringBuilder
          while (i < n && !Character.isWhitespace(s.charAt(i)) && s.charAt(i) != '=' &&
                 s.charAt(i) != '>' && s.charAt(i) != '/') {
            an.append(Character.toLowerCase(s.charAt(i))); i += 1
          }
          while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
          var value = ""
          if (i < n && s.charAt(i) == '=') {
            i += 1
            while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
            if (i < n && (s.charAt(i) == '"' || s.charAt(i) == '\'')) {
              val q = s.charAt(i); i += 1
              val e = s.indexOf(q, i)
              val end = if (e < 0) n else e
              value = s.substring(i, end)
              i = if (e < 0) n else e + 1
            } else {
              val vb = new StringBuilder
              while (i < n && !Character.isWhitespace(s.charAt(i)) && s.charAt(i) != '>') {
                vb.append(s.charAt(i)); i += 1
              }
              value = vb.toString
            }
          }
          if (an.nonEmpty) attrs += ((an.toString, Entities.decode(value)))
      }
    }
    (StartTag(name, attrs.toVector, selfClosing), i)
  }

  private def findCloseTag(s: String, from: Int, name: String): (Int, Int) = {
    val needle = "</" + name
    var i = from
    val n = s.length
    while (i < n) {
      val idx = indexOfIgnoreCase(s, needle, i)
      if (idx < 0) return (n, n)
      val after = idx + needle.length
      if (after >= n) return (idx, n)
      val c = s.charAt(after)
      if (c == '>' || Character.isWhitespace(c) || c == '/') {
        val e = s.indexOf('>', after)
        return (idx, if (e < 0) n else e + 1)
      }
      i = idx + 1
    }
    (n, n)
  }

  private def indexOfIgnoreCase(s: String, needle: String, from: Int): Int = {
    val n = s.length
    val m = needle.length
    var i = from
    while (i + m <= n) {
      if (s.regionMatches(true, i, needle, 0, m)) return i
      i += 1
    }
    -1
  }
}

/** Minimal HTML entity decoder: the named entities Tika's fixtures
  * exercise plus numeric forms. (Full HTML5 table unnecessary offline.)
  */
object Entities {
  private val named: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "copy" -> "©", "reg" -> "®", "trade" -> "™",
    "mdash" -> "—", "ndash" -> "–", "hellip" -> "…",
    "lsquo" -> "‘", "rsquo" -> "’", "ldquo" -> "“", "rdquo" -> "”",
    "eacute" -> "é", "egrave" -> "è", "agrave" -> "à",
    "uuml" -> "ü", "ouml" -> "ö", "auml" -> "ä", "szlig" -> "ß",
    "ccedil" -> "ç", "ntilde" -> "ñ", "deg" -> "°", "middot" -> "·",
    "bull" -> "•", "laquo" -> "«", "raquo" -> "»", "sect" -> "§",
    "para" -> "¶", "micro" -> "µ", "times" -> "×", "divide" -> "÷",
    "euro" -> "€", "pound" -> "£", "yen" -> "¥", "cent" -> "¢"
  )

  def decode(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val b = new StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 12) {
          val body = s.substring(i + 1, semi)
          val decoded: Option[String] =
            if (body.startsWith("#x") || body.startsWith("#X"))
              try Some(new String(Character.toChars(Integer.parseInt(body.substring(2), 16))))
              catch { case _: Exception => None }
            else if (body.startsWith("#"))
              try Some(new String(Character.toChars(Integer.parseInt(body.substring(1)))))
              catch { case _: Exception => None }
            else named.get(body)
          decoded match {
            case Some(d) => b.append(d); i = semi + 1
            case None => b.append(c); i += 1
          }
        } else { b.append(c); i += 1 }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }
}
