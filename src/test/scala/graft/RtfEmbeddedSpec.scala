package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}
import graft.core.{DocRow, Span, Status}
import graft.corpus.Corpus
import graft.engine.Extractor
import org.scalatest.funsuite.AnyFunSuite

/** RTF embedded objects (`\objdata` OLE 1.0 records, `\pict` images) —
  * reference rtf/RTFObjDataParser.java + RTFEmbObjHandler.java,
  * integration expectations from RTFParserTest.testEmbeddedMonster.
  */
class RtfEmbeddedSpec extends AnyFunSuite {

  private val docs = Path.of("/root/reference/tika-parsers/" +
    "tika-parsers-standard/tika-parsers-standard-modules/" +
    "tika-parser-microsoft-module/src/test/resources/test-documents")

  private def extract(b: Array[Byte], name: String = "t.rtf"): graft.core.ExtractedDoc =
    Extractor.extract(DocRow(name, Seq(Span("bytes", Corpus.b64(b), null, 0))))

  private def text(d: graft.core.ExtractedDoc): String =
    d.spans.filter(_.kind == Span.KindText).map(_.text).mkString("\n")

  // --- synthetic OLE1 builders -----------------------------------------

  private def u16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
  private def u16be(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
  private def u32(v: Int) =
    Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
  private def asciiz(s: String) = s.getBytes("windows-1252") :+ 0.toByte
  private def lenAnsi(s: String) = u32(s.length + 1) ++ asciiz(s)

  private def packageRecord(displayName: String, path: String,
      data: Array[Byte]): Array[Byte] =
    u16(2) ++ asciiz(displayName) ++ asciiz("") ++ u16be(0) ++
      u16(3) ++ u32(path.length + 1) ++ asciiz(path) ++
      u32(data.length) ++ data ++ u32(0)

  private def ole1(className: String, payload: Array[Byte]): Array[Byte] =
    u32(1) ++ u32(2) ++ lenAnsi(className) ++ lenAnsi("") ++ lenAnsi("") ++
      u32(payload.length) ++ payload

  private def hex(b: Array[Byte]): String =
    b.map(x => f"${x & 0xff}%02x").mkString

  test("objdata Package: filename + payload recurse as a child doc") {
    val payload = "Hello embedded world".getBytes(UTF_8)
    val obj = ole1("Package",
      packageRecord("Hw.txt", "C:\\tmp\\Hw.txt", payload))
    val rtf = ("{\\rtf1\\ansi before " +
      "{\\object\\objemb{\\*\\objdata " + hex(obj) + "}}" +
      " after\\par}").getBytes(UTF_8)
    val out = extract(rtf)
    assert(out.status == Status.ParseSuccess, out.status)
    val t = text(out)
    assert(t.contains("before") && t.contains("after"), t)
    assert(t.contains("Hello embedded world"), t)
    assert(out.meta("embedded:path").exists(_.endsWith(":Hw.txt")),
      out.meta("embedded:path"))
    assert(out.meta.get("rtf:emb_class").exists(_.contains("Package")))
    assert(out.meta.get("rtf:emb_original_path")
      .exists(_.contains("C:\\tmp\\Hw.txt")))
  }

  test("objdata link (formatId 1) embeds nothing") {
    val obj = u32(1) ++ u32(1) ++ lenAnsi("Package") ++ lenAnsi("") ++
      lenAnsi("") ++ u32(4) ++ Array[Byte](1, 2, 3, 4)
    val rtf = ("{\\rtf1\\ansi x{\\object{\\*\\objdata " + hex(obj) + "}}y\\par}")
      .getBytes(UTF_8)
    val out = extract(rtf)
    assert(out.status == Status.ParseSuccess)
    assert(out.meta.getOrElse("embedded:path", Nil).isEmpty,
      out.meta.getOrElse("embedded:path", Nil))
  }

  test("pict: hex png extracts as embedded-0.png; in-object pict is a thumbnail") {
    val png = graft.corpus.MediaCorpus.png(new scala.util.Random(7))
    val rtf = ("{\\rtf1\\ansi body " +
      "{\\pict\\pngblip\\picw10\\pich10 " + hex(png) + "}" +
      "{\\object\\objemb{\\*\\objdata 00}{\\result {\\pict\\pngblip " +
      hex(png) + "}}}" +
      "\\par}").getBytes(UTF_8)
    val out = extract(rtf)
    assert(out.status == Status.ParseSuccess)
    val paths = out.meta("embedded:path")
    assert(paths.exists(_.endsWith(":embedded-0.png")), paths)
    assert(paths.exists(p => p.contains(":thumbnail-0.png")), paths)
  }

  test("bin control word: raw bytes enter the pict payload") {
    val png = graft.corpus.MediaCorpus.png(new scala.util.Random(7))
    val rtf = ("{\\rtf1\\ansi {\\pict\\pngblip\\bin" + png.length + " ")
      .getBytes("windows-1252") ++ png ++ "}\\par}".getBytes("windows-1252")
    val out = extract(rtf)
    assert(out.status == Status.ParseSuccess)
    assert(out.meta("embedded:path").exists(_.endsWith(":embedded-0.png")),
      out.meta("embedded:path"))
  }

  test("Ole10Native record parses label, filename, and payload") {
    val data = "native payload".getBytes(UTF_8)
    val tail = u16(2) ++ asciiz("lbl.txt") ++
      asciiz("C:\\docs\\native.txt") ++ u16(0) ++ u16(0) ++
      u32(3) ++ asciiz("c:") ++ u32(data.length) ++ data
    val rec = u32(tail.length) ++ tail
    val parsed = graft.ole2.OleEmbedded.parseOle10Native(rec)
    assert(parsed.isDefined)
    val (name, payload) = parsed.get
    assert(name.contains("native.txt"), name)
    assert(new String(payload, UTF_8) == "native payload")
  }

  test("real fixture: testRTFEmbeddedFiles.rtf surfaces its package children") {
    val p = docs.resolve("testRTFEmbeddedFiles.rtf")
    org.scalatest.Assertions.assume(Files.isRegularFile(p), "fixtures absent")
    val out = extract(Files.readAllBytes(p))
    assert(out.status == Status.ParseSuccess, out.status)
    val paths = out.meta("embedded:path")
    // RTFParserTest.testEmbeddedMonster expectations reachable without
    // OCR: the Package-wrapped Hw.txt and the unicode-named jpeg
    assert(paths.exists(_.toLowerCase.endsWith(":hw.txt")), paths.take(20))
    assert(paths.exists(_.endsWith(".jpg")), paths.take(20))
    // OLE2-wrapped office payloads surface as embedded-N children
    assert(paths.exists(_.contains(":embedded-")), paths.take(20))
    assert(text(out).contains("Hello World"), text(out).take(600))
  }
}
