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
  /** Round-3 decoders under mutation: valid warc/bz2/xz/lz4 payloads
    * with truncation and bit flips must always CLASSIFY (document-level
    * status), never throw or hang.
    */
  test("property: mutated warc/bzip2/xz/lz4 payloads never escape the envelope") {
    val rnd = new scala.util.Random(7)
    val tar = graft.pkgx.TarUtil.write(Seq(
      "a.txt" -> ("fuzz seed content " * 20).getBytes("UTF-8")))
    val warc = graft.warc.WarcExtractor.write(Seq(
      ("http://x/y.html", "text/html", "<html><body>f</body></html>".getBytes("UTF-8"))))
    val seeds = Seq(
      graft.pkgx.Bzip2.compress(tar),
      graft.pkgx.Xz.compress(tar),
      graft.pkgx.Lz4.compress(tar),
      warc)
    seeds.foreach { valid =>
      (0 until 60).foreach { i =>
        val mutated = valid.clone()
        i % 3 match {
          case 0 => // single bit flip at a seeded position
            val p = rnd.nextInt(mutated.length)
            mutated(p) = (mutated(p) ^ (1 << rnd.nextInt(8))).toByte
          case 1 => // truncate
            val n = 1 + rnd.nextInt(mutated.length)
            val out = Extractor.extract(DocRow("f",
              Seq(Span("bytes", Corpus.b64(java.util.Arrays.copyOf(mutated, n)), null, 0))))
            assert(out.status != null && out.mime != null)
          case _ => // splice random tail
            val p = rnd.nextInt(mutated.length)
            (p until mutated.length).foreach(j => mutated(j) = rnd.nextInt(256).toByte)
        }
        val out = Extractor.extract(DocRow("f",
          Seq(Span("bytes", Corpus.b64(mutated), null, 0))))
        assert(out.status != null && out.mime != null)
      }
    }
  }

}
