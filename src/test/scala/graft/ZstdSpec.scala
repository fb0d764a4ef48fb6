package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64
import graft.core.{DocRow, Span, Status}
import graft.corpus.Corpus
import graft.engine.Extractor
import graft.pkgx.Zstd

/** From-scratch Zstandard decoder (RFC 8878): spec compliance against a
  * real zstd-CLI-produced frame (FSE sequence tables, Huffman literals,
  * xxHash64 content checksum), hostile input, and .zst recursion
  * through the engine.
  */
class ZstdSpec extends AnyFunSuite {

  /** `zstd -19` output from the reference zstd CLI. */
  private val referenceBlob = "KLUv/WRAGQUDAKLGFBGQfYArzTBZgNYzl3q5n29rBiDgqa7Lcn5V9D0dv1X12M2l8pNUPma5Hzuq7ntzxlTuvmuWufYZa/quSljd56cufBfzC3d15vJ9y7i/Y9Vd9xwKAgDRnHPoMCemoLJ2LzE="
  private val referencePlain =
    (("Reference zstd fixture: the graft engine must decode real zstd " +
      "CLI frames with FSE tables and huffman literals.\n") * 60).getBytes(UTF_8)

  test("decodes a zstd-CLI-produced frame byte-for-byte (xxh64 verified)") {
    val dec = Zstd.decompress(Base64.getDecoder.decode(referenceBlob))
    assert(dec.toSeq == referencePlain.toSeq)
  }

  test("xxHash64 matches the published empty-input vector") {
    // the full algorithm is additionally pinned by every CLI-produced
    // frame's verified content checksum (the reference-blob test above)
    assert(Zstd.xxh64(Array.emptyByteArray, 0, 0, 0L) == 0xEF46DB3751D8E999L)
  }

  test("hostile input: bad magic, corrupted frame, truncation classify") {
    intercept[Zstd.ZstdMalformed] { Zstd.decompress("NOTZSTD...".getBytes(UTF_8)) }
    val enc = Base64.getDecoder.decode(referenceBlob)
    val bad = enc.clone()
    bad(enc.length / 2) = (bad(enc.length / 2) ^ 0x2a).toByte
    intercept[RuntimeException] { Zstd.decompress(bad) }
    intercept[RuntimeException] {
      Zstd.decompress(java.util.Arrays.copyOf(enc, enc.length - 8))
    }
  }

  test("mutated frames always classify at the document level") {
    val rnd = new scala.util.Random(19)
    val valid = Base64.getDecoder.decode(referenceBlob)
    (0 until 60).foreach { i =>
      val m = valid.clone()
      if (i % 2 == 0) {
        val p = rnd.nextInt(m.length)
        m(p) = (m(p) ^ (1 << rnd.nextInt(8))).toByte
      }
      val payload = if (i % 2 == 0) m
        else java.util.Arrays.copyOf(m, 1 + rnd.nextInt(m.length))
      val out = Extractor.extract(DocRow("zf",
        Seq(Span("bytes", Corpus.b64(payload), null, 0))))
      assert(out.status != null && out.mime != null)
    }
  }

  test("bare .zst payload extracts through the engine") {
    val out = Extractor.extract(DocRow("z1",
      Seq(Span("bytes", Corpus.b64(Base64.getDecoder.decode(referenceBlob)),
        null, 0))))
    assert(out.mime == "application/zstd")
    assert(out.status == Status.ParseSuccess)
    assert(out.spans.filter(_.kind == "text").map(_.text).mkString
      .contains("decode real zstd"))
  }
}
