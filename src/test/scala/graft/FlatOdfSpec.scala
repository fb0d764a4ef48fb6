package graft

import java.nio.file.{Files, Path}
import graft.core.{DocRow, Span, Status}
import graft.corpus.Corpus
import graft.engine.Extractor
import org.scalatest.funsuite.AnyFunSuite

/** Flat (single-XML) OpenDocument extraction + StarBasic macros vs the
  * reference's real fixtures; expectations mirror the integration
  * ODFParserTest.testMacroODT family (macros opt-in, module names,
  * source text) and FlatOpenDocumentParser subtype detection.
  */
class FlatOdfSpec extends AnyFunSuite {

  private val docs = Path.of("/root/reference/tika-parsers/" +
    "tika-parsers-standard/tika-parsers-standard-modules/" +
    "tika-parser-miscoffice-module/src/test/resources/test-documents")

  private val MacroCfg = Extractor.DefaultConfig.copy(extractMacros = true)

  private def extract(b: Array[Byte], name: String,
      cfg: Extractor.Config = Extractor.DefaultConfig): graft.core.ExtractedDoc =
    Extractor.extract(DocRow(name, Seq(Span("bytes", Corpus.b64(b), null, 0))), cfg)

  private def text(d: graft.core.ExtractedDoc): String =
    d.spans.filter(_.kind == Span.KindText).map(_.text).mkString("\n")

  test("testODTMacro.fodt: flat text + subtype detection; macros opt-in") {
    val p = docs.resolve("testODTMacro.fodt")
    org.scalatest.Assertions.assume(Files.isRegularFile(p), "fixtures absent")
    val bytes = Files.readAllBytes(p)

    val off = extract(bytes, "t.fodt")
    assert(off.mime == "application/vnd.oasis.opendocument.flat.text", off.mime)
    assert(off.status == Status.ParseSuccess, off.status)
    assert(!text(off).contains("WsGQFM"), "macros must be opt-in")

    val on = extract(bytes, "t.fodt", MacroCfg)
    val t = text(on)
    assert(t.contains("If WsGQFM Or 2 Then"), t.takeRight(400))
    assert(t.contains("Shell("), t.takeRight(400))
    assert(on.meta.getOrElse("embedded:path", Nil).exists(_.endsWith(".bas")),
      on.meta.getOrElse("embedded:path", Nil))
  }

  test("testODSMacro.fods / testODPMacro.fodp subtype detection") {
    for ((nm, want) <- Seq(
        "testODSMacro.fods" -> "application/vnd.oasis.opendocument.flat.spreadsheet",
        "testODPMacro.fodp" -> "application/vnd.oasis.opendocument.flat.presentation")) {
      val p = docs.resolve(nm)
      org.scalatest.Assertions.assume(Files.isRegularFile(p), "fixtures absent")
      val d = extract(Files.readAllBytes(p), nm)
      assert(d.mime == want, s"$nm -> ${d.mime}")
      assert(d.status == Status.ParseSuccess, d.status)
    }
  }

  test("zipped testODTMacro.odt: Basic/ modules extract when opted in") {
    val p = docs.resolve("testODTMacro.odt")
    org.scalatest.Assertions.assume(Files.isRegularFile(p), "fixtures absent")
    val bytes = Files.readAllBytes(p)

    val off = extract(bytes, "t.odt")
    assert(off.status == Status.ParseSuccess)
    assert(text(off).contains("Hello dear user"), text(off).take(300))
    assert(!text(off).contains("WsGQFM"))

    val on = extract(bytes, "t.odt", MacroCfg)
    val t = text(on)
    assert(t.contains("Hello dear user"), t.take(300))
    assert(t.contains("If WsGQFM Or 2 Then"), t.takeRight(600))
    // module names become the child resource names (test, test2)
    val paths = on.meta.getOrElse("embedded:path", Nil)
    assert(paths.exists(_.endsWith(":test.bas")), paths)
    assert(paths.exists(_.endsWith(":test2.bas")), paths)
  }

  test("a plain <document> XML without the office namespace stays XML") {
    val xml = "<?xml version=\"1.0\"?><document><p>hi</p></document>"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val d = extract(xml, "plain.xml")
    assert(d.mime == "application/xml", d.mime)
  }
}
