package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{DocRow, Span, Status}
import graft.corpus.Corpus
import graft.engine.{Extractor, MetaSink, SpanSink}
import graft.textparse.MarkdownExtractor

class MarkdownSpec extends AnyFunSuite {

  val md =
    """# Project Title
      |
      |Intro paragraph with **bold** and `code` and a
      |wrapped second line.
      |
      |## Features
      |
      |- item one
      |- item [linked](http://example.com/doc) two
      |1. numbered
      |
      |> a quote line
      |
      |```
      |val x = 1  // verbatim <code>
      |```
      |""".stripMargin

  test("markdown structure flattens to text spans + title + links") {
    val sink = new SpanSink(); val meta = new MetaSink
    MarkdownExtractor.extract(md.getBytes("UTF-8"), sink, meta)
    val text = sink.result().filter(_.kind == "text").map(_.text).mkString
    assert(meta.result()("dc:title") == Seq("Project Title"))
    assert(text.contains("Intro paragraph with bold and code and a wrapped second line."))
    assert(text.contains("\titem one"))
    assert(text.contains("item linked two"))
    assert(text.contains("\tnumbered"))
    assert(text.contains("a quote line"))
    assert(text.contains("val x = 1  // verbatim <code>"))
    assert(!text.contains("**") && !text.contains("```"))
    assert(meta.result()("links").contains("http://example.com/doc"))
  }

  test("engine: .md zip member routes through the markdown parser") {
    val zip = Corpus.zip(Seq("README.md" -> md.getBytes("UTF-8")))
    val out = Extractor.extract(DocRow("md1",
      Seq(Span("bytes", Corpus.b64(zip), null, 0))))
    assert(out.status == Status.ParseSuccess)
    assert(out.meta("embedded:path").exists(_.endsWith(":README.md")))
    val text = out.spans.filter(_.kind == "text").map(_.text).mkString
    assert(text.contains("Project Title"))
    assert(text.contains("item one"))
  }
}
