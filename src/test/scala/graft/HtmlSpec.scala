package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{MetaSink, SpanSink}
import graft.html.{Boilerplate, HtmlExtractor}
import graft.core.Span

/** Golden HTML extraction semantics — mirrors the reference assertions in
  * HtmlParserTest.java:109-117 (title/creator/geo) and
  * BoilerpipeHandlerTest.java:46-115 (content boundaries).
  */
class HtmlSpec extends AnyFunSuite {

  private def extract(html: String): (Vector[Span], Map[String, Seq[String]]) = {
    val sink = new SpanSink()
    val meta = new MetaSink
    HtmlExtractor.extract(html, sink, meta)
    (sink.result(), meta.result())
  }

  private def text(spans: Vector[Span]): String =
    spans.filter(_.kind == "text").map(_.text).mkString

  test("title goes to metadata, not body text") {
    val (spans, meta) = extract(
      "<html><head><title>My Title</title></head><body><p>Body here.</p></body></html>")
    assert(meta("title") == Seq("My Title"))
    assert(!text(spans).contains("My Title"))
    assert(text(spans).contains("Body here."))
  }

  test("meta name/content + ICBM geo (HtmlHandler.java:198-208)") {
    val html = """<html><head>
      <meta name="author" content="Jane Doe">
      <meta name="ICBM" content="51.43, -0.22">
      </head><body><p>x</p></body></html>"""
    val (_, meta) = extract(html)
    assert(meta("author") == Seq("Jane Doe"))
    assert(meta("geo:lat") == Seq("51.43"))
    assert(meta("geo:long") == Seq("-0.22"))
  }

  test("script and style content discarded (DefaultHtmlMapper.java:83-86)") {
    val html = """<html><body><p>keep</p>
      <script>var secret = "DROPME";</script>
      <style>.x { color: DROPME; }</style>
      <p>also keep</p></body></html>"""
    val t = text(extract(html)._1)
    assert(!t.contains("DROPME"))
    assert(t.contains("keep"))
    assert(t.contains("also keep"))
  }

  test("ENDLINE newline after blocks; INDENT tab before cells/items " +
       "(XHTMLContentHandler.java:46-72)") {
    val html = "<html><body><p>one</p><p>two</p>" +
      "<ul><li>a</li><li>b</li></ul>" +
      "<table><tr><td>c1</td><td>c2</td></tr></table></body></html>"
    val t = text(extract(html)._1)
    assert(t.contains("one\ntwo\n"))
    assert(t.contains("\ta\n\tb\n"))   // li: tab before, newline after
    assert(t.contains("\tc1\tc2\n"))   // td: tab before; tr end: newline
  }

  test("br produces newline") {
    val t = text(extract("<html><body><p>a<br>b</p></body></html>")._1)
    assert(t.contains("a\nb"))
  }

  test("relative URL resolution against <base> (HtmlHandler.java:446-480)") {
    val html = """<html><head><base href="http://example.com/a/b/"></head>
      <body><p><a href="../up.html">u</a><img src="img/x.png"></p></body></html>"""
    val (spans, meta) = extract(html)
    assert(meta("links") == Seq("http://example.com/a/up.html"))
    val media = spans.filter(_.kind == "media")
    assert(media.map(_.media_ref) == Vector("http://example.com/a/b/img/x.png"))
  }

  test("media span splits text spans; offsets strictly non-decreasing") {
    val html = """<html><body><p>before</p><p><img src="x.png"></p><p>after</p></body></html>"""
    val (spans, _) = extract(html)
    val kinds = spans.map(_.kind)
    assert(kinds.containsSlice(Seq("text", "media", "text")))
    assert(spans.sliding(2).forall {
      case Seq(a, b) => a.offset <= b.offset
      case _ => true
    })
  }

  test("entities decoded; numeric refs") {
    val t = text(extract(
      "<html><body><p>a &amp; b &lt;c&gt; &#65;&#x42; &copy;</p></body></html>")._1)
    assert(t.contains("a & b <c> AB ©"))
  }

  test("implicit body: fragment without body tag still extracts") {
    val t = text(extract("<div><p>fragment text</p></div>")._1)
    assert(t.contains("fragment text"))
  }

  test("write limit → partial output with limit flag " +
       "(WriteOutContentHandler 100k default)") {
    val sink = new SpanSink(writeLimit = 50)
    val meta = new MetaSink
    val html = "<html><body><p>" + ("word " * 100) + "</p></body></html>"
    intercept[graft.engine.WriteLimitReached] {
      HtmlExtractor.extract(html, sink, meta)
    }
    assert(sink.limitReached)
    assert(sink.charCount <= 50)
  }

  test("boilerplate: nav/footer stripped, meat kept " +
       "(BoilerpipeHandlerTest.java:58-63 analog)") {
    val html = """<html><body>
      <div class="nav"><a href="/1">Home</a> | <a href="/2">About</a> | <a href="/3">News</a></div>
      <p>This is the real meat of the page and it has plenty of words to
         be classified as actual content by the shallow text features of
         the classifier which counts words and link density per block.</p>
      <p>A second long paragraph continues the main content with more
         sentences so that the number of words stays comfortably high.</p>
      <div class="footer"><a href="/t">Terms</a> | <a href="/p">Privacy</a> | Copyright 2026</div>
      </body></html>"""
    val main = Boilerplate.mainContentText(html)
    assert(main.startsWith("This is the real meat"))
    assert(!main.contains("Home"))
    assert(!main.contains("Privacy"))
  }

  test("boilerplate blocks carry link density") {
    val bs = Boilerplate.blocks(
      """<html><body><p><a href="x">all link text here</a></p><p>no links at all in this one</p></body></html>""")
    assert(bs.length == 2)
    assert(bs(0).linkDensity == 1.0)
    assert(bs(1).linkDensity == 0.0)
  }
}

class HtmlFidelitySpec extends org.scalatest.funsuite.AnyFunSuite {
  import graft.engine.{Extractor, MetaSink, SpanSink}
  import graft.core.{DocRow, Span, Status}

  test("title precedence: <title> element beats <meta name=title> " +
       "(HtmlHandler.java:224-228)") {
    val sink = new SpanSink(); val meta = new MetaSink
    HtmlExtractor.extract(
      """<html><head><meta name="title" content="Meta Title">
         <title>Element Title</title></head><body><p>x</p></body></html>""",
      sink, meta)
    assert(meta.result()("title") == Seq("Element Title"))

    val sink2 = new SpanSink(); val meta2 = new MetaSink
    HtmlExtractor.extract(
      """<html><head><meta name="title" content="Meta Only"></head>
         <body><p>x</p></body></html>""", sink2, meta2)
    assert(meta2.result()("title") == Seq("Meta Only"))
  }

  test("data: URI image becomes an embedded document (:355-380)") {
    val inner = "<html><body><p>inner doc text</p></body></html>"
    val b64 = java.util.Base64.getEncoder.encodeToString(
      inner.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val html = s"""<html><body><p>before</p>
      <img src="data:text/html;base64,$b64"><p>after</p></body></html>"""
    val out = Extractor.extract(DocRow("du1", Seq(Span("html", html, null, 0))))
    assert(out.spans.exists(_.kind == "embedded-open"))
    val t = out.spans.filter(_.kind == "text").map(_.text).mkString
    assert(t.contains("inner doc text"))
    assert(t.indexOf("before") < t.indexOf("inner doc text"))
    assert(t.indexOf("inner doc text") < t.indexOf("after"))
  }

  test("iframe srcdoc becomes an embedded document (:337-353)") {
    val html = """<html><body><p>host</p>
      <iframe srcdoc="<p>framed content</p>"></iframe></body></html>"""
    val out = Extractor.extract(DocRow("sd1", Seq(Span("html", html, null, 0))))
    val t = out.spans.filter(_.kind == "text").map(_.text).mkString
    assert(t.contains("framed content"))
    assert(out.meta("embedded:path").head.contains("srcdoc.html"))
  }

  test("soft deadline -> status timeout with partial spans") {
    val cfg = Extractor.DefaultConfig.copy(softDeadlineMs = 0L) // off
    val ok = Extractor.extract(graft.corpus.Corpus.row(1), cfg)
    assert(ok.status != Status.Timeout)
    // a deadline already in the past trips on the first chars()
    val sink = new SpanSink(deadlineNanos = System.nanoTime() - 1)
    intercept[graft.engine.DocTimeout] { sink.chars("x") }
  }

  test("rmeta JSON projection: container first, embedded entries follow") {
    import graft.corpus.Corpus
    val zipRow = (0L until 1000L).find(i => Corpus.kindOf(i) == "zip" &&
      !Corpus.isBombShaped(i)).get
    val doc = Extractor.extract(Corpus.row(zipRow))
    val json = graft.ops.Projections.toRmetaJson(doc)
    assert(json.startsWith("[{\"tk:doc_id\""))
    assert(json.contains("\"tk:content\""))
    assert(json.contains("\"tk:embedded_id_path\":\"/1\""))
  }
}
