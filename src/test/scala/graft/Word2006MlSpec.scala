package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}
import graft.core.{DocRow, Span, Status}
import graft.corpus.Corpus
import graft.engine.Extractor
import org.scalatest.funsuite.AnyFunSuite

/** Word 2006 ML (single-XML OOXML package) vs the reference's real
  * fixture; expectations mirror ml2006/Word2006MLParserTest. Plus the
  * EPUB OPF root-XML disambiguation sharing the same `package` root.
  */
class Word2006MlSpec extends AnyFunSuite {

  private val docs = Path.of("/root/reference/tika-parsers/" +
    "tika-parsers-standard/tika-parsers-standard-modules/" +
    "tika-parser-microsoft-module/src/test/resources/test-documents")

  private def extract(b: Array[Byte], name: String = "t.xml"): graft.core.ExtractedDoc =
    Extractor.extract(DocRow(name, Seq(Span("bytes", Corpus.b64(b), null, 0))))

  private def text(d: graft.core.ExtractedDoc): String =
    d.spans.filter(_.kind == Span.KindText).map(_.text).mkString("\n")

  test("testWORD_2006ml.xml: metadata, body text, binary-part children") {
    val p = docs.resolve("testWORD_2006ml.xml")
    org.scalatest.Assertions.assume(Files.isRegularFile(p), "fixtures absent")
    val d = extract(Files.readAllBytes(p))
    assert(d.mime == "application/vnd.ms-word2006ml", d.mime)
    assert(d.status == Status.ParseSuccess, d.status)
    assert(d.meta.get("dc:title").exists(_.contains("My Document Title")), d.meta)
    assert(d.meta.get("dc:creator").exists(_.contains("This is the Author")))
    assert(d.meta.get("dcterms:created").exists(_.head.startsWith("2016-11-29T17:54:00")),
      d.meta.get("dcterms:created"))
    assert(d.meta.get("cp:revision").exists(_.contains("2")))
    assert(d.meta.get("cp:last-modified-by").exists(_.contains("Allison, Timothy B.")))
    assert(d.meta.get("meta:word-count").exists(_.contains("260")))
    assert(d.meta.get("meta:paragraph-count").exists(_.contains("3")))
    assert(d.meta.get("meta:character-count-with-spaces").exists(_.contains("1742")))
    assert(d.meta.get("meta:line-count").exists(_.contains("12")))
    assert(d.meta.get("extended-properties:app-version").exists(_.contains("16.0000")))
    assert(d.meta.get("extended-properties:doc-security").exists(_.contains("0")))
    val t = text(d)
    assert(t.contains("My Document Title"), t.take(400))
    assert(t.contains("My Document Subtitle"), t.take(400))
    assert(t.contains("This is an engaging title page"), t.take(600))
    // deleted runs (w:delText) are excluded by default, like the reference
    assert(!t.contains("frog"), "deleted text must be opt-in")
    // the 9 binary parts (thumbnails/images) recurse as children
    assert(d.meta.getOrElse("embedded:path", Nil).nonEmpty,
      d.meta.getOrElse("embedded:path", Nil))
  }

  test("EPUB OPF package detects separately from word2006ml") {
    val opf = ("<?xml version=\"1.0\"?>\n" +
      "<package xmlns=\"http://www.idpf.org/2007/opf\" version=\"2.0\">\n" +
      "<metadata xmlns:dc=\"http://purl.org/dc/elements/1.1/\">\n" +
      "<dc:title>A Book</dc:title><dc:creator>An Author</dc:creator>\n" +
      "</metadata><manifest/><spine/></package>").getBytes(UTF_8)
    val d = extract(opf, "content.opf")
    assert(d.mime == "application/oebps-package+xml", d.mime)
    assert(d.status == Status.ParseSuccess, d.status)
    assert(d.meta.get("dc:title").exists(_.contains("A Book")), d.meta)

    // a plain <package> root with neither namespace stays generic XML
    val plain = "<?xml version=\"1.0\"?><package><thing/></package>".getBytes(UTF_8)
    assert(extract(plain, "p.xml").mime == "application/xml")
  }
}
