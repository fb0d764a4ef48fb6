package graft

import java.nio.file.{Files, Path}
import graft.core.{DocRow, Span, Status}
import graft.corpus.Corpus
import graft.engine.Extractor
import org.scalatest.funsuite.AnyFunSuite

/** iWork '13+ packages vs the reference's real fixtures; expectations
  * mirror iwana/IWork13ParserTest (type from slide entries or the
  * resource-name extension, iworks:* plist properties, thumbnail
  * child; iwa protobuf text is a declared no-op in the reference too).
  */
class Iwork13Spec extends AnyFunSuite {

  private val docs = Path.of("/root/reference/tika-parsers/" +
    "tika-parsers-standard/tika-parsers-standard-modules/" +
    "tika-parser-apple-module/src/test/resources/test-documents")

  private def extract(b: Array[Byte], name: String): graft.core.ExtractedDoc =
    Extractor.extract(DocRow(name, Seq(Span("bytes", Corpus.b64(b), null, 0))))

  test("testNumbers2013.numbers: subtype by name, plist properties, thumbnail") {
    val p = docs.resolve("testNumbers2013.numbers")
    org.scalatest.Assertions.assume(Files.isRegularFile(p), "fixtures absent")
    val d = extract(Files.readAllBytes(p), "testNumbers2013.numbers")
    assert(d.mime == "application/vnd.apple.numbers.13", d.mime)
    assert(d.status == Status.ParseSuccess, d.status)
    assert(d.meta.get("iworks:isMultiPage").exists(_.contains("true")), d.meta)
    assert(d.meta.get("iworks:versionUUID")
      .exists(_.contains("C5ED6463-575C-43B9-8FDA-1957B186C422")),
      d.meta.get("iworks:versionUUID"))
    assert(d.meta.getOrElse("embedded:path", Nil).exists(_.endsWith(":preview.jpg")),
      d.meta.getOrElse("embedded:path", Nil))
  }

  test("testKeynote2013.key: slide entries force the keynote type") {
    val p = docs.resolve("testKeynote2013.key")
    org.scalatest.Assertions.assume(Files.isRegularFile(p), "fixtures absent")
    // even WITHOUT the .key extension the slide iwa names decide
    val d = extract(Files.readAllBytes(p), "noext")
    assert(d.mime == "application/vnd.apple.keynote.13", d.mime)
    assert(d.status == Status.ParseSuccess, d.status)
  }

  test("testPages2013.pages: extension hint picks pages.13") {
    val p = docs.resolve("testPages2013.pages")
    org.scalatest.Assertions.assume(Files.isRegularFile(p), "fixtures absent")
    val d = extract(Files.readAllBytes(p), "testPages2013.pages")
    assert(d.mime == "application/vnd.apple.pages.13", d.mime)
    val d2 = extract(Files.readAllBytes(p), "noext")
    assert(d2.mime == "application/vnd.apple.unknown.13", d2.mime)
  }
}
