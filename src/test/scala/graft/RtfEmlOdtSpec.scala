package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import graft.engine.{Extractor, MetaSink, SpanSink}
import graft.core.{DocRow, Span, Status}
import graft.corpus.Corpus
import graft.textparse.RtfExtractor
import graft.mail.EmlExtractor

class RtfSpec extends AnyFunSuite {

  private def extract(rtf: String): String = {
    val sink = new SpanSink()
    RtfExtractor.extract(rtf.getBytes(ISO_8859_1), sink, new MetaSink)
    sink.result().filter(_.kind == "text").map(_.text).mkString
  }

  test("basic paragraphs, tab, escapes") {
    val t = extract("""{\rtf1\ansi Hello World\par Second\tab col\par}""")
    assert(t.contains("Hello World\n"))
    assert(t.contains("Second\tcol\n"))
  }

  test("font/color/info tables skipped; formatting words silent") {
    val t = extract("""{\rtf1{\fonttbl{\f0 Arial;}}{\info{\title Secret}}\b bold\b0 normal\par}""")
    assert(!t.contains("Arial"))
    assert(!t.contains("Secret"))
    // the space after a control word is a delimiter, not content
    assert(t.contains("boldnormal"))
  }

  test("hex and unicode escapes with \\uc skip") {
    // "\\u8212?" = RTF 舒 (em dash) with one fallback char to skip
    val rtf = "{\\rtf1 caf\\'e9 and \\u8212? dash\\par}"
    val t = extract(rtf)
    assert(t.contains("café and — dash"), t)
  }

  test("\\* optional destinations skipped") {
    val t = extract("""{\rtf1 keep {\*\themedata junkdata} after\par}""")
    assert(!t.contains("junkdata"))
    assert(t.contains("keep"))
    assert(t.contains("after"))
  }

  test("\\* mid-group is a no-op, not a destination skip (TIKA testRTFIgnoredControlWord)") {
    // reference TextExtractor only treats \* as ignorable when it is the
    // FIRST token of a group (processGroupStart:1464-1476)
    val t = extract("""{\rtf1 {\f2\b0\*\cs7\cf0 The quick brown fox}\par}""")
    assert(t.contains("The quick brown fox"), t)
  }

  test("header/footer destination text is emitted (TIKA-2410 testBoldPlain)") {
    val t = extract("""{\rtf1{\header\qc\b Animal Hospital\par}body\par}""")
    assert(t.contains("Animal Hospital"), t)
    assert(t.contains("body"))
  }

  test("info fields become metadata, never body text") {
    val sink = new SpanSink()
    val meta = new MetaSink
    RtfExtractor.extract(
      """{\rtf1{\info{\title My T\'e9tle}{\author Ann B}{\company ACME}}body\par}"""
        .getBytes(ISO_8859_1), sink, meta)
    val text = sink.result().filter(_.kind == "text").map(_.text).mkString
    assert(!text.contains("My T"))
    assert(!text.contains("Ann B"))
    assert(text.contains("body"))
    val m = meta.result()
    assert(m("dc:title") == Seq("My Tétle"), m)
    assert(m("dc:creator") == Seq("Ann B"))
    assert(m("company") == Seq("ACME"))
  }

  test("engine: corpus rtf detected and parsed") {
    val out = Extractor.extract(DocRow("r1",
      Seq(Span("bytes", Corpus.b64(Corpus.rtfDoc(Corpus.rng(5))), null, 0))))
    assert(out.mime == "application/rtf")
    assert(out.status == Status.ParseSuccess)
    assert(out.spans.exists(s => s.kind == "text" && s.text.contains("—")))
  }
}

class EmlSpec extends AnyFunSuite {

  test("headers to metadata; multipart text + html parts; attachment recursion") {
    val out = Extractor.extract(DocRow("e1",
      Seq(Span("bytes", Corpus.b64(Corpus.emlDoc(Corpus.rng(9))), null, 0))))
    assert(out.mime == "message/rfc822")
    assert(out.status == Status.ParseSuccess)
    assert(out.meta.contains("dc:subject"))
    assert(out.meta("Message:From").head.endsWith("@example.com"))
    val text = out.spans.filter(_.kind == "text").map(_.text).mkString
    assert(text.nonEmpty)
    // attachment became an embedded doc
    assert(out.spans.exists(_.kind == "embedded-open"))
    assert(out.meta("embedded:path").head.contains("notes.txt"))
  }

  test("quoted-printable and RFC2047 header decoding") {
    val msg = ("Subject: =?utf-8?B?" +
      java.util.Base64.getEncoder.encodeToString("Héllo".getBytes(UTF_8)) +
      "?=\r\nContent-Type: text/plain; charset=utf-8\r\n" +
      "Content-Transfer-Encoding: quoted-printable\r\n\r\n" +
      "caf=C3=A9 line=\r\njoined\r\n").getBytes(UTF_8)
    val sink = new SpanSink()
    val meta = new MetaSink
    EmlExtractor.extract(msg, sink, meta, (_, _) => ())
    assert(meta.result()("dc:subject") == Seq("Héllo"))
    val t = sink.result().map(_.text).mkString
    assert(t.contains("café linejoined"))
  }
}

class OdtSpec extends AnyFunSuite {

  test("engine: corpus odt detected via mimetype entry and parsed") {
    val out = Extractor.extract(DocRow("o1",
      Seq(Span("bytes", Corpus.b64(Corpus.odtDoc(Corpus.rng(3))), null, 0))))
    assert(out.mime == "application/vnd.oasis.opendocument.text")
    assert(out.status == Status.ParseSuccess)
    assert(out.meta.contains("dc:title"))
    val t = out.spans.filter(_.kind == "text").map(_.text).mkString
    assert(t.contains("With\ttab and\nbreak"))
    assert(t.split("\n").count(_.trim.nonEmpty) >= 3)
  }

  test("epub-shaped zip specializes and recurses chapters") {
    val epub = Corpus.zip(Seq(
      "mimetype" -> "application/epub+zip".getBytes(UTF_8),
      "ch1.xhtml" -> "<html><body><p>chapter one text</p></body></html>".getBytes(UTF_8)))
    val out = Extractor.extract(DocRow("ep1",
      Seq(Span("bytes", Corpus.b64(epub), null, 0))))
    assert(out.mime == "application/epub+zip")
    val t = out.spans.filter(_.kind == "text").map(_.text).mkString
    assert(t.contains("chapter one text"))
  }
}

class FeedSpec extends AnyFunSuite {
  test("atom feed: feed title to metadata, entry titles+summaries as blocks") {
    val atom = """<?xml version="1.0" encoding="utf-8"?>
<feed xmlns="http://www.w3.org/2005/Atom">
  <title>Example Feed</title>
  <link href="http://example.org/"/>
  <entry><title>First Post</title><summary>Summary one.</summary></entry>
  <entry><title>Second Post</title><summary>Summary two.</summary></entry>
</feed>"""
    val out = Extractor.extract(DocRow("f1",
      Seq(Span("xml", atom, null, 0))))
    assert(out.mime == "application/atom+xml")
    assert(out.meta("title") == Seq("Example Feed"))
    val t = out.spans.filter(_.kind == "text").map(_.text).mkString
    assert(t == "First Post\nSummary one.\nSecond Post\nSummary two.\n")
    assert(out.meta("links") == Seq("http://example.org/"))
  }

  test("rss feed: channel title + item blocks") {
    val rss = """<?xml version="1.0"?>
<rss version="2.0"><channel>
  <title>News Channel</title>
  <item><title>Item A</title><description>Desc A</description></item>
</channel></rss>"""
    val out = Extractor.extract(DocRow("f2", Seq(Span("xml", rss, null, 0))))
    assert(out.mime == "application/rss+xml")
    assert(out.meta("title") == Seq("News Channel"))
    val t = out.spans.filter(_.kind == "text").map(_.text).mkString
    assert(t == "Item A\nDesc A\n")
  }
}

class MboxSpec extends AnyFunSuite {
  test("mbox: member messages become embedded rfc822 docs") {
    val m1 = "From: a@example.com\r\nSubject: First\r\n\r\nbody one\r\n"
    val m2 = "From: b@example.com\r\nSubject: Second\r\n\r\nbody two\r\n"
    val mbox = ("From a@example.com Thu Jan  1 10:00:00 2026\n" + m1 +
      "\nFrom b@example.com Thu Jan  1 11:00:00 2026\n" + m2)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = Extractor.extract(DocRow("mb1",
      Seq(Span("bytes", Corpus.b64(mbox), null, 0))))
    assert(out.mime == "application/mbox")
    assert(out.spans.count(_.kind == "embedded-open") == 2)
    val t = out.spans.filter(_.kind == "text").map(_.text).mkString
    assert(t.contains("body one"))
    assert(t.contains("body two"))
    assert(out.meta("embedded:/1").head == "message/rfc822")
  }
}
