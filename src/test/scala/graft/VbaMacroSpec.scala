package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}
import graft.core.{DocRow, Span, Status}
import graft.corpus.Corpus
import graft.engine.Extractor
import graft.ole2.VbaMacros
import org.scalatest.funsuite.AnyFunSuite

/** VBA macro extraction (MS-OVBA) vs the reference's real macro
  * fixtures; expectations mirror WordParserTest.testMacros /
  * ExcelParserTest (Sub names in module source, opt-in gating) and
  * ActiveMimeParser's unwrap semantics.
  */
class VbaMacroSpec extends AnyFunSuite {

  private val docs = Path.of("/root/reference/tika-parsers/" +
    "tika-parsers-standard/tika-parsers-standard-modules/" +
    "tika-parser-microsoft-module/src/test/resources/test-documents")

  private val MacroCfg = Extractor.DefaultConfig.copy(extractMacros = true)

  private def extract(b: Array[Byte], name: String,
      cfg: Extractor.Config = MacroCfg): graft.core.ExtractedDoc =
    Extractor.extract(DocRow(name, Seq(Span("bytes", Corpus.b64(b), null, 0))), cfg)

  private def text(d: graft.core.ExtractedDoc): String =
    d.spans.filter(_.kind == Span.KindText).map(_.text).mkString("\n")

  test("MS-OVBA decompress: raw chunk") {
    val data = "hello raw chunk".getBytes(UTF_8)
    val header = (data.length + 2 - 3) | 0x3000 // uncompressed, sig 0b011
    val container = Array[Byte](0x01, header.toByte, (header >> 8).toByte) ++ data
    assert(new String(VbaMacros.decompress(container, 0), UTF_8) == "hello raw chunk")
  }

  test("MS-OVBA decompress: literal run + copy token") {
    // "abcdef" literals, then a copy token (offset 6, length 6) doubles it
    val payload = Array[Byte](0x40, 'a', 'b', 'c', 'd', 'e', 'f', 0x03, 0x50)
    val header = (payload.length + 2 - 3) | 0x3000 | 0x8000
    val container = Array[Byte](0x01, header.toByte, (header >> 8).toByte) ++ payload
    assert(new String(VbaMacros.decompress(container, 0), UTF_8) == "abcdefabcdef")
  }

  test("testWORD_macros.doc: modules extract when opted in, not by default") {
    val p = docs.resolve("testWORD_macros.doc")
    org.scalatest.Assertions.assume(Files.isRegularFile(p), "fixtures absent")
    val bytes = Files.readAllBytes(p)

    val off = extract(bytes, "m.doc", Extractor.DefaultConfig)
    assert(off.meta.getOrElse("embedded:macro", Nil).isEmpty,
      off.meta.getOrElse("embedded:macro", Nil))

    val on = extract(bytes, "m.doc")
    assert(on.status == Status.ParseSuccess, on.status)
    val t = text(on)
    assert(t.contains("Sub Embolden()"), t.takeRight(400))
    assert(t.contains("Sub Italicize()"), t.takeRight(400))
    assert(on.meta("embedded:macro").nonEmpty)
    assert(on.meta("embedded:path").exists(_.endsWith(".vba")),
      on.meta("embedded:path"))
  }

  test("testEXCEL_macro.xls: Sub Dirty() with its body") {
    val p = docs.resolve("testEXCEL_macro.xls")
    org.scalatest.Assertions.assume(Files.isRegularFile(p), "fixtures absent")
    val on = extract(Files.readAllBytes(p), "m.xls")
    val t = text(on)
    assert(t.contains("Sub Dirty()"), t.takeRight(400))
    assert(t.contains("dirty dirt dirt"), t.takeRight(400))
  }

  test("testWORD_macros.docm: vbaProject.bin part yields the same modules") {
    val p = docs.resolve("testWORD_macros.docm")
    org.scalatest.Assertions.assume(Files.isRegularFile(p), "fixtures absent")
    val on = extract(Files.readAllBytes(p), "m.docm")
    val t = text(on)
    assert(t.contains("Sub Embolden()"), t.takeRight(400))
  }

  test("testPPT_macros.ppt / .pptm: the VBA project surfaces via recursion") {
    for (nm <- Seq("testPPT_macros.ppt", "testPPT_macros.pptm")) {
      val p = docs.resolve(nm)
      org.scalatest.Assertions.assume(Files.isRegularFile(p), "fixtures absent")
      val on = extract(Files.readAllBytes(p), nm)
      assert(on.meta.getOrElse("embedded:macro", Nil).contains("Module1"),
        (nm, on.meta.getOrElse("embedded:macro", Nil)))
    }
  }

  test("activemime .mso wrapping a real vbaProject.bin extracts macros") {
    val p = docs.resolve("testWORD_macros.docm")
    org.scalatest.Assertions.assume(Files.isRegularFile(p), "fixtures absent")
    val docm = Files.readAllBytes(p)
    val vba = graft.zipx.ZipUtil.entry(docm, "word/vbaProject.bin").get

    // zlib-deflate and wrap in the 46-byte ActiveMime header
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(vba); deflater.finish()
    val zbuf = new Array[Byte](vba.length + 64)
    val zlen = deflater.deflate(zbuf)
    deflater.end()
    def u32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    val mso = "ActiveMime".getBytes(UTF_8) ++ Array[Byte](0, 0) ++
      Array[Byte](0, 0) ++ u32(4) ++ u32(-1) ++ u32(0x6f0) ++
      u32(zlen) ++ u32(0) ++ u32(0) ++ u32(vba.length) ++ u32(0) ++
      zbuf.take(zlen)

    // ActiveMimeParser extracts macros unconditionally (no config gate)
    val out = extract(mso, "editdata.mso", Extractor.DefaultConfig)
    assert(out.mime == "application/x-activemime", out.mime)
    assert(out.status == Status.ParseSuccess, out.status)
    assert(text(out).contains("Sub Embolden()"), text(out).takeRight(400))
  }

  test("macro children detect as text/x-vbasic via the .vba hint") {
    val p = docs.resolve("testWORD_macros.doc")
    org.scalatest.Assertions.assume(Files.isRegularFile(p), "fixtures absent")
    val on = extract(Files.readAllBytes(p), "m.doc")
    val macroMimes = on.meta.keys.filter(_.startsWith("embedded:/"))
      .flatMap(k => on.meta(k)).filter(_ == "text/x-vbasic")
    assert(macroMimes.nonEmpty, on.meta.keys.filter(_.startsWith("embedded:")))
  }
}
