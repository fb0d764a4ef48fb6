package graft

import java.nio.file.{Files, Path}
import graft.core.{DocRow, Span, Status}
import graft.corpus.Corpus
import graft.engine.Extractor
import org.scalatest.funsuite.AnyFunSuite

/** Apple plist extraction: the reference's real binary fixture plus an
  * XML plist round-trip.
  */
class PlistSpec extends AnyFunSuite {

  private val docs = Path.of("/root/reference/tika-parsers/" +
    "tika-parsers-standard/tika-parsers-standard-modules/" +
    "tika-parser-apple-module/src/test/resources/test-documents")

  private def extractBytes(name: String, b: Array[Byte]): graft.core.ExtractedDoc =
    Extractor.extract(DocRow(name, Seq(Span("bytes", Corpus.b64(b), null, 0))))

  private def text(d: graft.core.ExtractedDoc): String =
    d.spans.filter(_.kind == Span.KindText).map(_.text).mkString("\n")

  test("testBPList.bplist: binary plist keys + values surface") {
    org.scalatest.Assertions.assume(
      Files.isRegularFile(docs.resolve("testBPList.bplist")),
      "reference fixtures not present")
    val d = extractBytes("testBPList.bplist",
      Files.readAllBytes(docs.resolve("testBPList.bplist")))
    assert(d.mime == "application/x-bplist", d.mime)
    assert(d.status == Status.ParseSuccess, d.status)
    assert(text(d).nonEmpty)
  }

  test("iTunes-shaped bplist subtype detection + content") {
    // build a tiny binary plist by hand: {"Tracks": "t", "Playlists": "p",
    // "Music Folder": "file:///m/"} — exercises dict/string/ref decoding
    val objs = Vector(
      // strings: keys then values
      "Tracks", "Playlists", "Music Folder", "t", "p", "file:///m/")
    val out = new java.io.ByteArrayOutputStream()
    out.write("bplist00".getBytes("US-ASCII"))
    val offsets = new Array[Int](7)
    // object 0: dict with 3 entries (keys 1,2,3 values 4,5,6)
    offsets(0) = out.size
    out.write(0xd3); out.write(1); out.write(2); out.write(3)
    out.write(4); out.write(5); out.write(6)
    objs.zipWithIndex.foreach { case (s, i) =>
      offsets(i + 1) = out.size
      out.write(0x50 | s.length)
      out.write(s.getBytes("US-ASCII"))
    }
    val tableOff = out.size
    offsets.foreach(o => out.write(o))
    // trailer
    out.write(new Array[Byte](6))
    out.write(1) // offsetIntSize
    out.write(1) // objectRefSize
    def be8(v: Long): Unit = { var i = 7; while (i >= 0) { out.write(((v >> (8 * i)) & 0xff).toInt); i -= 1 } }
    be8(7); be8(0); be8(tableOff)
    val d = extractBytes("t.bplist", out.toByteArray)
    assert(d.status == Status.ParseSuccess, d.status)
    assert(d.meta.get("plist:subtype").exists(_.contains("itunes")), d.meta.get("plist:subtype"))
    val t = text(d)
    assert(t.contains("Tracks\tt"), t)
    assert(t.contains("Music Folder\tfile:///m/"), t)
  }

  test("XML plist: dict/array/scalars render with keys") {
    val xml = """<?xml version="1.0" encoding="UTF-8"?>
      |<!DOCTYPE plist PUBLIC "-//Apple//DTD PLIST 1.0//EN" "http://www.apple.com/DTDs/PropertyList-1.0.dtd">
      |<plist version="1.0"><dict>
      |  <key>Name</key><string>graft</string>
      |  <key>Count</key><integer>42</integer>
      |  <key>Nested</key><dict><key>flag</key><true/></dict>
      |  <key>Items</key><array><string>a</string><string>b</string></array>
      |</dict></plist>""".stripMargin.getBytes("UTF-8")
    val sink = new graft.engine.SpanSink()
    val meta = new graft.engine.MetaSink()
    graft.textparse.PlistExtractor.extract(xml, sink, meta)
    val t = sink.result().map(_.text).mkString("\n")
    assert(t.contains("Name\tgraft"), t)
    assert(t.contains("Count\t42"))
    assert(t.contains("flag\ttrue"))
    assert(t.contains("a") && t.contains("b"))
  }

  test("AppleSingle-wrapped PDF unwraps and parses (testAppleSingleFile.pdf)") {
    org.scalatest.Assertions.assume(
      Files.isRegularFile(docs.resolve("testAppleSingleFile.pdf")),
      "reference fixtures not present")
    val d = extractBytes("testAppleSingleFile.pdf",
      Files.readAllBytes(docs.resolve("testAppleSingleFile.pdf")))
    assert(d.mime == "application/applefile", d.mime)
    assert(d.status == Status.ParseSuccess, d.status)
    assert(text(d).nonEmpty)
    assert(d.meta.exists { case (k, vs) =>
      k == "embedded:/1" && vs.exists(_.contains("pdf")) }, d.meta.get("embedded:1"))
  }

  test("Safari webarchive: WebResourceData recurses into the HTML") {
    org.scalatest.Assertions.assume(
      Files.isRegularFile(docs.resolve("testWEBARCHIVE.webarchive")),
      "reference fixtures not present")
    val d = extractBytes("testWEBARCHIVE.webarchive",
      Files.readAllBytes(docs.resolve("testWEBARCHIVE.webarchive")))
    assert(d.status == Status.ParseSuccess, d.status)
    assert(d.meta.get("plist:subtype").exists(_.contains("webarchive")),
      d.meta.get("plist:subtype"))
    // the archived page's text must surface through the embedded parse
    assert(d.spans.exists(s => s.kind == Span.KindText && s.text.nonEmpty))
    assert(d.meta.keys.exists(_.startsWith("embedded:")), d.meta.keys.take(10))
  }
}
