package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64
import graft.core.{DocRow, Span, Status}
import graft.corpus.Corpus
import graft.engine.Extractor
import graft.pkgx.{Lz4, TarUtil}

/** From-scratch LZ4 frame codec: spec compliance against a real
  * lz4-CLI-produced fixture (compressed blocks with matches, frame +
  * content checksums), writer round-trips, hostile input, and .tar.lz4
  * recursion through the engine.
  */
class Lz4Spec extends AnyFunSuite {

  /** `lz4 -9` output from the reference lz4 CLI. */
  private val referenceBlob = "BCJNGGRAp24AAADxKVJlZmVyZW5jZSBsejQgZml4dHVyZTogdGhlIGdyYWZ0IGVuZ2luZSBtdXN0IGRlY29kZSByZWFsLwD/C0NMSSBzdHJlYW1zIHdpdGggbWF0Y2hlcy4KVwD/////////////////NlBoZXMuCgAAAAAwtlTb"
  private val referencePlain =
    ("Reference lz4 fixture: the graft engine must decode real lz4 CLI " +
     "streams with matches.\n" * 40).getBytes(UTF_8)

  test("decodes an lz4-CLI-produced frame byte-for-byte") {
    val dec = Lz4.decompress(Base64.getDecoder.decode(referenceBlob))
    // fixture plain = one line repeated 40x
    assert(new String(dec, UTF_8) ==
      "Reference lz4 fixture: the graft engine must decode real lz4 CLI streams with matches.\n" * 40)
  }

  test("xxHash32 matches the published test vectors") {
    assert(Lz4.xxh32(Array.emptyByteArray, 0, 0, 0) == 0x02CC5D05)
    // xxh32("Hello World", seed 0) — public vector
    val hw = "Hello World".getBytes(UTF_8)
    assert(Lz4.xxh32(hw, 0, hw.length, 0) == 0xB1FD16EE)
  }

  test("writer round-trips and hostile inputs throw") {
    val rnd = new scala.util.Random(17)
    Seq[Array[Byte]](Array.emptyByteArray, "x".getBytes(UTF_8),
      Array.fill[Byte](200000)(rnd.nextInt(256).toByte)).foreach { s =>
      assert(Lz4.decompress(Lz4.compress(s)).toSeq == s.toSeq)
    }
    intercept[Lz4.Lz4Malformed] { Lz4.decompress("NOTLZ4....".getBytes(UTF_8)) }
    val enc = Base64.getDecoder.decode(referenceBlob)
    val bad = enc.clone()
    bad(12) = (bad(12) ^ 0x7f).toByte
    intercept[RuntimeException] { Lz4.decompress(bad) }
  }

  test("tar.lz4 recurses through the engine") {
    val tar = TarUtil.write(Seq(
      "doc.txt" -> "lz4 member text content".getBytes(UTF_8)))
    val out = Extractor.extract(DocRow("l1",
      Seq(Span("bytes", Corpus.b64(Lz4.compress(tar)), null, 0))))
    assert(out.mime == "application/x-lz4")
    assert(out.status == Status.ParseSuccess)
    assert(out.meta("embedded:/1") == Seq("application/x-tar"))
    assert(out.spans.filter(_.kind == "text").map(_.text).mkString
      .contains("lz4 member text content"))
  }
}
