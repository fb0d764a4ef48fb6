package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8
import graft.engine.{MetaSink, SpanSink}
import graft.ooxml.DocxExtractor
import graft.corpus.Corpus

class DocxAuxSpec extends AnyFunSuite {

  test("headers before body, footnotes after; separator notes skipped") {
    val docXml =
      """<?xml version="1.0"?><w:document xmlns:w="http://x"><w:body>
      <w:p><w:r><w:t>BODY TEXT</w:t></w:r></w:p></w:body></w:document>"""
    val header =
      """<?xml version="1.0"?><w:hdr xmlns:w="http://x">
      <w:p><w:r><w:t>HEADER TEXT</w:t></w:r></w:p></w:hdr>"""
    val footnotes =
      """<?xml version="1.0"?><w:footnotes xmlns:w="http://x">
      <w:footnote w:type="separator" w:id="-1"><w:p><w:r><w:t>SEP</w:t></w:r></w:p></w:footnote>
      <w:footnote w:id="1"><w:p><w:r><w:t>FOOTNOTE TEXT</w:t></w:r></w:p></w:footnote>
      </w:footnotes>"""
    val zip = Corpus.zip(Seq(
      "[Content_Types].xml" -> "<Types/>".getBytes(UTF_8),
      "word/document.xml" -> docXml.getBytes(UTF_8),
      "word/header1.xml" -> header.getBytes(UTF_8),
      "word/footnotes.xml" -> footnotes.getBytes(UTF_8)))
    val sink = new SpanSink()
    DocxExtractor.extract(zip, sink, new MetaSink)
    val t = sink.result().map(_.text).mkString
    assert(t.indexOf("HEADER TEXT") >= 0)
    assert(t.indexOf("HEADER TEXT") < t.indexOf("BODY TEXT"))
    assert(t.indexOf("BODY TEXT") < t.indexOf("FOOTNOTE TEXT"))
    assert(!t.contains("SEP"))
  }
}
