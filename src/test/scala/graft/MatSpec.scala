package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import graft.core.{DocRow, Span, Status}
import graft.corpus.Corpus
import graft.engine.Extractor
import org.scalatest.funsuite.AnyFunSuite

/** MAT-file (Level 5) extraction vs the reference's real fixture;
  * assertions mirror mat/MatParserTest — header metadata + the
  * `name:[RxC  class array]` variable listing, struct fields expanded.
  */
class MatSpec extends AnyFunSuite {

  private val docs = Path.of("/root/reference/tika-parsers/" +
    "tika-parsers-standard/tika-parsers-standard-modules/" +
    "tika-parser-code-module/src/test/resources/test-documents")

  private def extract(b: Array[Byte], name: String = "t.mat"): graft.core.ExtractedDoc =
    Extractor.extract(DocRow(name, Seq(Span("bytes", Corpus.b64(b), null, 0))))

  private def text(d: graft.core.ExtractedDoc): String =
    d.spans.filter(_.kind == Span.KindText).map(_.text).mkString("\n")

  test("test_mat_text.mat: header metadata + compressed variable (MatParserTest.testParserForText)") {
    val p = docs.resolve("test_mat_text.mat")
    org.scalatest.Assertions.assume(Files.isRegularFile(p), "fixtures absent")
    val d = extract(Files.readAllBytes(p))
    assert(d.mime == "application/x-matlab-data", d.mime)
    assert(d.status == Status.ParseSuccess, d.status)
    assert(d.meta.get("fileType").exists(_.contains("MATLAB 5.0 MAT-file")))
    assert(d.meta.get("platform").exists(_.contains("MACI64")))
    assert(d.meta.get("endian").exists(_.contains("IM")))
    assert(d.meta.get("dcterms:created").exists(_.contains("Wed Jun  4 14:54:43 2014")))
    assert(text(d).contains("double:[2x2  double array]"), text(d))
  }

  // --- synthetic MAT5 writer (LE) for the struct path -------------------

  private def le32(v: Int): Array[Byte] =
    Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)

  private def pad8(a: Array[Byte]): Array[Byte] =
    a ++ new Array[Byte]((8 - (a.length & 7)) & 7)

  private def element(t: Int, data: Array[Byte]): Array[Byte] =
    le32(t) ++ le32(data.length) ++ pad8(data)

  /** miMATRIX of doubles rows x cols with a name (payload zeros). */
  private def numeric(name: String, rows: Int, cols: Int): Array[Byte] = {
    val flags = element(6, le32(6) ++ le32(0)) // class 6 = double
    val dims = element(5, le32(rows) ++ le32(cols))
    val nm = element(1, name.getBytes(StandardCharsets.US_ASCII))
    val pr = element(9, new Array[Byte](rows * cols * 8)) // miDOUBLE
    element(14, flags ++ dims ++ nm ++ pr)
  }

  /** 1x1 struct named `name` whose fields are the given matrices. */
  private def struct(name: String, fields: Seq[(String, Array[Byte])]): Array[Byte] = {
    val flags = element(6, le32(2) ++ le32(0)) // class 2 = struct
    val dims = element(5, le32(1) ++ le32(1))
    val nm = element(1, name.getBytes(StandardCharsets.US_ASCII))
    val fieldLen = element(5, le32(32))
    val names = fields.map { case (fn, _) =>
      val b = new Array[Byte](32)
      val raw = fn.getBytes(StandardCharsets.US_ASCII)
      System.arraycopy(raw, 0, b, 0, raw.length); b
    }.fold(Array.emptyByteArray)(_ ++ _)
    val fieldNames = element(1, names)
    element(14, flags ++ dims ++ nm ++ fieldLen ++ fieldNames ++
      fields.map(_._2).fold(Array.emptyByteArray)(_ ++ _))
  }

  private def matFile(body: Array[Byte]): Array[Byte] = {
    val desc = "MATLAB 5.0 MAT-file, Platform: PCWIN64, Created on: Thu Feb 21 15:52:49 2013"
    val hdr = new Array[Byte](128)
    java.util.Arrays.fill(hdr, ' '.toByte)
    val d = desc.getBytes(StandardCharsets.US_ASCII)
    System.arraycopy(d, 0, hdr, 0, d.length)
    hdr(124) = 0; hdr(125) = 1; hdr(126) = 'I'; hdr(127) = 'M'
    hdr ++ body
  }

  test("struct variables list their fields (MatParserTest.testParser shape)") {
    val b1 = struct("b1", Seq(
      "profile" -> numeric("", 1024, 1),
      "matrix" -> numeric("", 1024, 1261)))
    val c1 = struct("c1", Seq("trace" -> numeric("", 1, 909)))
    val d = extract(matFile(b1 ++ c1))
    assert(d.status == Status.ParseSuccess, d.status)
    val t = text(d)
    assert(t.contains("b1:[1x1  struct array]"), t)
    assert(t.contains("c1:[1x1  struct array]"))
    assert(t.contains("[1024x1  double array]"))
    assert(t.contains("[1024x1261  double array]"))
    assert(t.contains("[1x909  double array]"))
    assert(d.meta.get("platform").exists(_.contains("PCWIN64")))
    assert(d.meta.get("dcterms:created").exists(_.contains("Thu Feb 21 15:52:49 2013")))
  }

  test("malformed: truncated header / element bombs recorded, not crashed") {
    val d1 = extract(matFile(Array[Byte](14, 0, 0, 0)).take(130))
    assert(d1.status == Status.ParseException, d1.status)
    // element claiming 2GB payload in a 200-byte file
    val d2 = extract(matFile(le32(14) ++ le32(Int.MaxValue) ++ new Array[Byte](64)))
    assert(d2.status == Status.ParseException, d2.status)
  }
}
