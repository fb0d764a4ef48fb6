package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.core.{DocRow, Span}
import graft.engine.Extractor
import graft.corpus.Corpus

/** Property tests (FIXTURES.md §5): at web scale every malformed byte
  * sequence eventually arrives — the engine must classify, never throw.
  */
class FuzzSpec extends AnyFunSuite {

  /** Deterministic sampling of a generator (scalacheck without the
    * scalatestplus bridge, which is not on the offline classpath).
    */
  private def forAll[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }


  private val htmlish: Gen[String] = {
    val frag = Gen.oneOf(
      Gen.alphaNumStr,
      Gen.oneOf("<", ">", "&", "\"", "'", "</", "<!", "<!--", "-->", "]]>",
        "<![CDATA[", "<p>", "</p>", "<script>", "</script>", "&amp;", "&#x",
        "<div class=", "=\"", "<html", "<body", "<?", "<meta ", "<iframe srcdoc=\""))
    Gen.listOf(frag).map(_.mkString).map(_.take(4096))
  }

  test("property: arbitrary html-ish input never throws; offsets consistent") {
    forAll(htmlish) { html =>
      val out = Extractor.extract(DocRow("f", Seq(Span("html", html, null, 0))))
      var expected = 0
      out.spans.foreach { s =>
        assert(s.offset == expected)
        if (s.kind == "text") expected += s.text.length
      }
    }
  }

  test("property: arbitrary bytes never throw; status is always set") {
    forAll(Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))) {
      bytes =>
        val out = Extractor.extract(DocRow("f",
          Seq(Span("bytes", Corpus.b64(bytes), null, 0))))
        assert(out.status != null && out.mime != null)
    }
  }

  test("property: truncated real payloads never throw") {
    val payloads = Seq(
      Corpus.docxDoc(Corpus.rng(11)), Corpus.pdfDoc(Corpus.rng(12), 12),
      Corpus.zipDoc(Corpus.rng(13)), Corpus.odtDoc(Corpus.rng(14)),
      Corpus.emlDoc(Corpus.rng(15)), Corpus.rtfDoc(Corpus.rng(16)))
    for (p <- payloads; n <- Seq(1, 7, 64, p.length / 2, p.length - 1)) {
      val out = Extractor.extract(DocRow("t",
        Seq(Span("bytes", Corpus.b64(p.take(n)), null, 0))))
      assert(out.status != null)
    }
  }

  test("property: detection is a pure function (same bytes, same result)") {
    forAll(htmlish) { s =>
      val b = s.getBytes("UTF-8")
      assert(graft.mime.MimeRegistry.detect(b) == graft.mime.MimeRegistry.detect(b))
    }
  }
}
