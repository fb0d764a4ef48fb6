package graft

import graft.core.{DocRow, Span, Status}
import graft.corpus.Corpus
import graft.engine.Extractor
import org.scalatest.funsuite.AnyFunSuite

/** ARJ walk: stored entries recurse, compressed entries are declared
  * unsupported — the commons-compress ArjArchiveInputStream capability
  * the reference dispatches to. Fixtures are hand-built per the ARJ
  * TECHNOTE framing (the reference ships no .arj fixture).
  */
class ArjSpec extends AnyFunSuite {

  private def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
  private def le32(v: Int) =
    Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)

  /** One header block: magic, size, fixed part, name, comment, crc, ext. */
  private def header(method: Int, compSize: Int, origSize: Int,
      name: String): Array[Byte] = {
    val fixed = new java.io.ByteArrayOutputStream
    val FirstHdrSize = 30
    fixed.write(FirstHdrSize) // first_hdr_size
    fixed.write(11); fixed.write(1) // version, min version
    fixed.write(0) // host os
    fixed.write(0) // flags
    fixed.write(method)
    fixed.write(0) // file type
    fixed.write(0) // reserved
    fixed.write(le32(0)) // mtime
    fixed.write(le32(compSize))
    fixed.write(le32(origSize))
    fixed.write(le32(0)) // original crc
    fixed.write(le16(0)) // filespec pos
    fixed.write(le16(0)) // access mode
    fixed.write(le16(0)) // host data
    val nameB = name.getBytes("ISO-8859-1")
    fixed.write(nameB); fixed.write(0) // NUL-terminated name
    fixed.write(0) // empty comment
    val basic = fixed.toByteArray
    val out = new java.io.ByteArrayOutputStream
    out.write(0x60); out.write(0xea)
    out.write(le16(basic.length))
    out.write(basic)
    out.write(le32(0)) // basic header crc (not verified by the walk)
    out.write(le16(0)) // no extended headers
    out.toByteArray
  }

  private def arj(entries: (String, Array[Byte], Int)*): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    out.write(header(0, 0, 0, "test.arj")) // main header
    entries.foreach { case (name, data, method) =>
      out.write(header(method, data.length, data.length, name))
      out.write(data)
    }
    out.write(Array[Byte](0x60.toByte, 0xea.toByte)); out.write(le16(0)) // end
    out.toByteArray
  }

  private def extract(b: Array[Byte]): graft.core.ExtractedDoc =
    Extractor.extract(DocRow("t.arj",
      Seq(Span("bytes", Corpus.b64(b), null, 0))))

  test("stored entries recurse and extract") {
    val d = extract(arj(
      ("a.txt", "first arj member text".getBytes("UTF-8"), 0),
      ("b.txt", "second arj member text".getBytes("UTF-8"), 0)))
    assert(d.mime == graft.mime.MimeDb.Arj)
    assert(d.status == Status.ParseSuccess)
    val t = d.spans.filter(_.kind == graft.core.Span.KindText)
      .map(_.text).mkString("\n")
    assert(t.contains("first arj member text"))
    assert(t.contains("second arj member text"))
    assert(d.meta.getOrElse("arj:entry", Seq.empty).size == 2)
  }

  test("compressed-method entry is recorded unsupported, not a crash") {
    val d = extract(arj(("c.bin", Array.fill[Byte](10)(7), 1)))
    assert(d.status == Status.UnsupportedType ||
      d.status == Status.ParseSuccess)
    assert(d.meta.getOrElse("arj:entry", Seq.empty)
      .exists(_.startsWith("c.bin:")))
    // no child extracted from a compressed entry
    assert(!d.meta.contains("embedded:path"))
  }

  test("truncated archive records a parse exception") {
    val whole = arj(("a.txt", "x".getBytes, 0))
    val d = extract(java.util.Arrays.copyOf(whole, whole.length - 8))
    assert(d.status != Status.ParseSuccess)
  }
}
