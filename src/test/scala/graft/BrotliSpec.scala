package graft

import java.nio.file.{Files, Path}
import graft.core.{DocRow, Span, Status}
import graft.corpus.Corpus
import graft.engine.Extractor
import graft.pkgx.Brotli
import org.scalatest.funsuite.AnyFunSuite

/** Brotli decoder (RFC 7932, from scratch) + the CompressorParser .br
  * route. The reference routes brotli via the external brotli-dec
  * library (pkg-module CompressorParser.java); expectations mirror
  * CompressorParserTest.testBrotli (testBROTLI_compressed.br holds
  * "XXXXXXXXXXYYYYYYYYYY"). The committed fixture matrix was produced
  * by the independent libbrotli encoder across qualities 0-11, window
  * bits 10-24, and both generic/text modes, so a byte-exact decode is
  * interop evidence, not a self-round-trip.
  */
class BrotliSpec extends AnyFunSuite {

  private val docs = Path.of("/root/reference/tika-parsers/" +
    "tika-parsers-standard/tika-parsers-standard-modules/" +
    "tika-parser-pkg-module/src/test/resources/test-documents")

  private def res(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/brotli/$name")
    assert(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  test("decodes the full independent-encoder fixture matrix byte-exact") {
    // dicttext: q11 static-dictionary + transform references
    // utf8: text mode, UTF8 literal context modeling, multibyte ferment
    // random: incompressible -> uncompressed metablocks
    // rep: long backward copies through the distance ring
    // allbytes: q0 simple codes, all 256 literals
    // big: 150 KB through multiple block switches at q9/w24
    for (n <- Seq("dicttext", "utf8", "random", "rep", "allbytes",
        "empty", "one", "big")) {
      val got = Brotli.decompress(res(s"$n.br"))
      val want = res(s"$n.raw")
      assert(java.util.Arrays.equals(got, want),
        s"$n: got ${got.length} bytes, want ${want.length}")
    }
  }

  test("reference fixture testBROTLI_compressed.br decodes") {
    org.scalatest.Assertions.assume(
      Files.isRegularFile(docs.resolve("testBROTLI_compressed.br")),
      "reference fixtures not present")
    val b = Files.readAllBytes(docs.resolve("testBROTLI_compressed.br"))
    val d = new String(Brotli.decompress(b), "ISO-8859-1")
    assert(d == "XXXXXXXXXXYYYYYYYYYY", d)
  }

  test("extractor .br route recurses into the inner document") {
    org.scalatest.Assertions.assume(
      Files.isRegularFile(docs.resolve("testBROTLI_compressed.br")),
      "reference fixtures not present")
    val b = Files.readAllBytes(docs.resolve("testBROTLI_compressed.br"))
    val d = Extractor.extract(DocRow("testBROTLI_compressed.br",
      Seq(Span("bytes", Corpus.b64(b), null, 0))))
    assert(d.mime == "application/x-brotli", d.mime)
    assert(d.status == Status.ParseSuccess, d.status)
    val text = d.spans.filter(_.kind == Span.KindText).map(_.text).mkString
    assert(text.contains("XXXXXXXXXX") && text.contains("YYYYYYYYYY"), text)
  }

  test("truncated and garbage streams fail cleanly") {
    val good = res("dicttext.br")
    intercept[Brotli.BrotliMalformed] {
      Brotli.decompress(good.take(good.length / 2))
    }
    // random high-entropy bytes: either malformed or decodes to
    // something small — must never loop or blow memory
    val junk = Array.tabulate[Byte](64)(i => ((i * 37 + 11) & 0xff).toByte)
    try { val out = Brotli.decompress(junk); assert(out.length < (1 << 24)) }
    catch { case _: Brotli.BrotliMalformed => () }
  }

  test("minimal empty stream (wbits=16, ISLAST+ISLASTEMPTY) decodes") {
    // bits LSB-first: 0 (wbits 16), 1 (ISLAST), 1 (ISLASTEMPTY) = 0x06
    assert(Brotli.decompress(Array[Byte](0x06)).isEmpty)
  }

  test("ferment transforms on words ending mid-UTF-8 stay in bounds") {
    // several static-dictionary words end on a 2/3-byte UTF-8 opener;
    // libbrotli's ToUpperCase XORs past the word into ring-buffer
    // scratch that later writes overwrite, so the observable behavior
    // is a dropped write — never an index crash. tid 44 = uppercase-all
    // ("", ""), tid 9 = uppercase-first ("", "").
    val words = Seq(
      Array[Byte]('a'.toByte, 0xC3.toByte),               // 2-byte opener last
      Array[Byte]('a'.toByte, 0xE4.toByte),               // 3-byte opener last
      Array[Byte]('a'.toByte, 0xE4.toByte, 0xB8.toByte),  // 3-byte, one short
      Array[Byte](0xC3.toByte),                           // opener IS the word
      Array[Byte](0xE4.toByte))
    for (w <- words; tid <- Seq(9, 44)) {
      val out = Brotli.transformWord(w.clone(), tid)
      assert(out.length == w.length, s"tid=$tid")
      if ((w(0) & 0xff) < 192) assert(out(0) == 'A'.toByte, s"tid=$tid")
      else assert(out(0) == w(0), s"tid=$tid") // overshoot dropped
    }
  }
}
