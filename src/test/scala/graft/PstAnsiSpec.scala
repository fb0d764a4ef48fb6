package graft

import graft.core.{DocRow, Span, Status}
import graft.corpus.{Corpus, PstCorpus}
import graft.engine.Extractor
import org.scalatest.funsuite.AnyFunSuite

/** ANSI (wVer 14/15, 32-bit) PST support — r5, closing the round-4
  * "recorded unsupported" gap. No real ANSI fixture exists in the
  * reference tree (all its .pst files are wVer 23), so the fixture is
  * synthesized by `PstCorpus.pstFileAnsi` straight from the MS-PST ANSI
  * layout tables (§2.2.2.5-8): 164-byte-offset ROOT with 32-bit BREFs,
  * 496-entry-byte BTPAGEs with 12-byte trailers, 16-byte NBTENTRY /
  * 12-byte BBTENTRY, 12-byte block trailers, bCryptMethod at 0x1CD.
  * The store shape (root + Inbox + 3 permute-encoded messages) matches
  * the Unicode corpus writer, so the assertions below prove the two
  * formats walk to the same logical content.
  */
class PstAnsiSpec extends AnyFunSuite {

  private def text(d: graft.core.ExtractedDoc): String =
    d.spans.filter(_.kind == Span.KindText).map(_.text).mkString("\n")

  test("synthetic ANSI PST extracts folders and messages like Unicode") {
    val seed = 77
    val ansiBytes = PstCorpus.pstFileAnsi(new scala.util.Random(seed))
    val uniBytes = PstCorpus.pstFile(new scala.util.Random(seed))
    val a = Extractor.extract(DocRow("legacy.pst",
      Seq(Span("bytes", Corpus.b64(ansiBytes), null, 0))))
    val u = Extractor.extract(DocRow("modern.pst",
      Seq(Span("bytes", Corpus.b64(uniBytes), null, 0))))
    assert(a.status == Status.ParseSuccess, a.status)
    assert(a.meta("pst:message_count") == u.meta("pst:message_count"))
    assert(a.meta("pst:folder_count") == u.meta("pst:folder_count"))
    val at = text(a)
    val ut = text(u)
    assert(at.contains("Inbox"), at.take(200))
    // identical seeds -> identical subjects/bodies through both layouts
    assert(at == ut, s"ANSI walk diverged from Unicode:\n$at\n---\n$ut")
  }

  test("ANSI with an unsupported crypt method fails the document") {
    val b = PstCorpus.pstFileAnsi(new scala.util.Random(3))
    b(0x1cd) = 2 // NDB_CRYPT_CYCLIC — still a declared exclusion
    val d = Extractor.extract(DocRow("cyclic.pst",
      Seq(Span("bytes", Corpus.b64(b), null, 0))))
    assert(d.status != Status.ParseSuccess)
  }

  test("ANSI XBLOCK (4-byte bids) and SLBLOCK (12-byte entries) walk") {
    // hand-built micro-file: header + one BBT leaf + data/X/SL blocks
    val f = new Array[Byte](4096)
    def le16a(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def le32a(v: Long) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    def put(off: Int, b: Array[Byte]): Unit =
      System.arraycopy(b, 0, f, off, b.length)
    put(0, "!BDN".getBytes("US-ASCII")); put(8, "SM".getBytes("US-ASCII"))
    put(10, le16a(15))
    val root = 164
    put(root + 4, le32a(4096))
    put(root + 20, le32a(0x3c2L)); put(root + 24, le32a(1536)) // NBT (empty page)
    put(root + 28, le32a(0x3c0L)); put(root + 32, le32a(1024)) // BBT
    f(0x1cc) = 0x80.toByte; f(0x1cd) = 0 // no encoding
    // data blocks: bid 4 @2048 "AAAA", bid 8 @2112 "BB"
    // XBLOCK bid 6 @2176 -> [4, 8]; SLBLOCK bid 10 @2240 -> nid 0x21 -> (4, 0)
    val blocks = Seq[(Long, Int, Array[Byte])](
      (4L, 2048, "AAAA".getBytes), (8L, 2112, "BB".getBytes),
      (6L, 2176, Array[Byte](1, 1) ++ le16a(2) ++ le32a(6) ++
        le32a(4) ++ le32a(8)),
      (10L, 2240, Array[Byte](2, 0) ++ le16a(1) ++
        le32a(0x21) ++ le32a(4) ++ le32a(0)))
    // BBT leaf page (ANSI): 12-byte entries, meta at 496, trailer at 500
    val ents = blocks.flatMap { case (bid, ib, data) =>
      le32a(bid) ++ le32a(ib) ++ le16a(data.length) ++ le16a(1)
    }.toArray
    put(1024, ents)
    f(1024 + 496) = blocks.size.toByte; f(1024 + 497) = (496 / 12).toByte
    f(1024 + 498) = 12; f(1024 + 499) = 0
    f(1024 + 500) = 0x80.toByte; f(1024 + 501) = 0x80.toByte
    put(1024 + 504, le32a(0x3c0L))
    // empty NBT leaf page
    f(1536 + 496) = 0; f(1536 + 497) = (496 / 16).toByte
    f(1536 + 498) = 16; f(1536 + 499) = 0
    f(1536 + 500) = 0x81.toByte; f(1536 + 501) = 0x81.toByte
    put(1536 + 504, le32a(0x3c2L))
    // block payloads + ANSI 12-byte trailers (cb, wSig, bid, dwCRC=0:
    // trailer CRC is not enforced by the reader, bid/cb are)
    blocks.foreach { case (bid, ib, data) =>
      put(ib, data)
      val total = ((data.length + 12 + 63) / 64) * 64
      put(ib + total - 12, le16a(data.length) ++ le16a(0) ++ le32a(bid) ++
        le32a(0))
    }
    val ndb = new graft.pst.PstExtractor.Ndb(f)
    val parts = ndb.dataBlocks(6L).map(new String(_, "US-ASCII"))
    assert(parts == Vector("AAAA", "BB"), parts)
    val subs = ndb.subnodes(10L)
    assert(subs == Map(0x21L -> ((4L, 0L))), subs)
  }
}
