package graft.html

import scala.collection.mutable.ArrayBuffer
import graft.engine.{MetaSink, SpanSink}

/** Main-content extraction (boilerplate stripping).
  *
  * Reference wiring: tika-handlers .../BoilerpipeContentHandler.java:51-361
  * buffers TextBlocks and replays only `block.isContent()` blocks as `<p>`
  * + '\n'. The classifier itself is the public boilerpipe
  * NumWordsRulesClassifier (Kohlschütter, Fankhauser, Nejdl: "Boilerplate
  * Detection using Shallow Text Features", WSDM 2010) — a fixed decision
  * tree over (numWords, linkDensity) of the previous/current/next block.
  * Reimplemented here from the published algorithm.
  */
object Boilerplate {

  final case class TextBlock(text: String, numWords: Int, anchorWords: Int) {
    def linkDensity: Double = if (numWords == 0) 0.0 else anchorWords.toDouble / numWords
  }

  /** Segment the body of an HTML document into text blocks, tracking
    * anchor-text word counts (boilerpipe's BoilerpipeHTMLContentHandler
    * equivalent, driven by our tokenizer).
    */
  def blocks(html: String): Vector[TextBlock] = {
    val tokens = HtmlTokenizer.tokenize(html)
    val out = new ArrayBuffer[TextBlock]()
    var bodyLevel = 0
    var implicitBody = false
    var sawBody = false
    var headLevel = 0
    var discard = 0
    var titleLevel = 0
    var anchorLevel = 0
    val buf = new StringBuilder
    var words = 0
    var aWords = 0

    def inBody: Boolean = (bodyLevel > 0 || implicitBody) && discard == 0 &&
      headLevel == 0 && titleLevel == 0

    def flush(): Unit = {
      val t = buf.toString.trim
      if (t.nonEmpty) out += TextBlock(t, words, aWords)
      buf.setLength(0); words = 0; aWords = 0
    }

    def countWords(s: String): Int = s.split("\\s+").count(_.nonEmpty)

    tokens.foreach {
      case tag @ StartTag(name, _, selfClosing) =>
        if (!sawBody && bodyLevel == 0 && headLevel == 0 && name != "html" &&
            !HtmlTables.HeadOnly.contains(name) && !HtmlTables.Discardable.contains(name))
          implicitBody = true
        name match {
          case "body" => sawBody = true; bodyLevel += 1
          case "head" => headLevel += 1
          case "title" => if (bodyLevel == 0) titleLevel += 1
          case "a" => anchorLevel += 1
          case n if HtmlTables.Discardable.contains(n) => if (!selfClosing) discard += 1
          case _ => ()
        }
        if (inBody && (HtmlTables.EndLine.contains(name) || name == "td" || name == "th"))
          flush()
      case EndTag(name) =>
        name match {
          case "body" => if (bodyLevel > 0) bodyLevel -= 1
          case "head" => if (headLevel > 0) headLevel -= 1
          case "title" => if (titleLevel > 0) titleLevel -= 1
          case "a" => if (anchorLevel > 0) anchorLevel -= 1
          case n if HtmlTables.Discardable.contains(n) => if (discard > 0) discard -= 1
          case _ => ()
        }
        if (inBody && HtmlTables.EndLine.contains(name)) flush()
      case TextRun(text) =>
        if (inBody) {
          if (!sawBody && bodyLevel == 0 && text.trim.nonEmpty) implicitBody = true
          val w = countWords(text)
          buf.append(text)
          words += w
          if (anchorLevel > 0) aWords += w
        } else if (!sawBody && bodyLevel == 0 && headLevel == 0 && discard == 0 &&
                   titleLevel == 0 && text.trim.nonEmpty) {
          implicitBody = true
          buf.append(text); words += countWords(text)
        }
    }
    flush()
    out.toVector
  }

  /** The published NumWordsRulesClassifier decision tree (WSDM 2010 ruleset
    * as shipped in public boilerpipe):
    *
    * curr.linkDensity <= 1/3:
    *   prev.linkDensity <= 0.555556:
    *     curr.numWords <= 16 && next.numWords <= 15 && prev.numWords <= 4
    *       → BOILERPLATE, else CONTENT
    *   prev.linkDensity > 0.555556:
    *     curr.numWords <= 40 && next.numWords <= 17 → BOILERPLATE, else CONTENT
    * curr.linkDensity > 1/3 → BOILERPLATE
    */
  def isContent(prev: TextBlock, curr: TextBlock, next: TextBlock): Boolean = {
    if (curr.linkDensity > 0.333333) false
    else if (prev.linkDensity <= 0.555556) {
      if (curr.numWords <= 16) {
        if (next.numWords <= 15) prev.numWords > 4
        else true
      } else true
    } else {
      if (curr.numWords <= 40) next.numWords > 17
      else true
    }
  }

  private val Empty = TextBlock("", 0, 0)

  def contentBlocks(bs: Vector[TextBlock]): Vector[TextBlock] =
    bs.zipWithIndex.collect {
      case (b, i) if isContent(
        if (i > 0) bs(i - 1) else Empty, b,
        if (i < bs.length - 1) bs(i + 1) else Empty) => b
    }

  /** Replay content blocks the way BoilerpipeContentHandler.endDocument
    * does (:200-296): each content block as one paragraph + '\n'.
    */
  def extract(html: String, sink: SpanSink, meta: MetaSink): Unit = {
    val content = contentBlocks(blocks(html))
    content.foreach { b =>
      sink.chars(b.text)
      sink.newline()
    }
    meta.set("boilerplate:numBlocks", content.length.toString)
  }

  def mainContentText(html: String): String =
    contentBlocks(blocks(html)).map(_.text).mkString("\n")
}
