package graft

import java.nio.charset.StandardCharsets.ISO_8859_1

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{MetaSink, SpanSink}
import graft.ole2.{CfbWriter, PptExtractor}
import graft.pdf.PdfExtractor

/** Regressions for the round-5 self-review fixes (truncated encrypted
  * CurrentUserAtom, self-referential structure-tree arrays, decryptPpt
  * record-walk bounds).
  */
class R5FixRegressionSpec extends AnyFunSuite {

  private def le32(v: Int): Array[Byte] =
    Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)

  /** A Current User stream of `len` bytes carrying the encrypted
    * headerToken 0xF3D1C4DF at offset 12 (MS-PPT §2.3.2).
    */
  private def encryptedCurrentUser(len: Int): Array[Byte] = {
    val cu = new Array[Byte](len)
    System.arraycopy(le32(0xF3D1C4DF), 0, cu, 12, 4)
    if (len >= 20) System.arraycopy(le32(0x7fffffff), 0, cu, 16, 4)
    cu
  }

  test("16-byte encrypted CurrentUserAtom fails encrypted, not as plaintext") {
    // the token sits at bytes 12-15; a stream truncated right after it
    // must still be detected as an encrypted deck. Before the fix the
    // >= 20 length gate skipped detection and the ciphertext walked the
    // plaintext record path.
    val doc = new Array[Byte](256)
    // a plausible-looking TextBytesAtom so the plaintext walk WOULD
    // produce garbage text if detection were skipped
    System.arraycopy(Array[Byte](0, 0), 0, doc, 0, 2)
    doc(2) = (PptExtractor.TextBytesAtom & 0xff).toByte
    doc(3) = (PptExtractor.TextBytesAtom >> 8).toByte
    System.arraycopy(le32(16), 0, doc, 4, 4)
    "ciphertextbytes!".getBytes(ISO_8859_1).copyToArray(doc, 8)
    for (len <- Seq(16, 17, 19)) {
      val bytes = CfbWriter.write(Seq(
        "Current User" -> encryptedCurrentUser(len),
        "PowerPoint Document" -> doc))
      val ex = intercept[IllegalArgumentException] {
        PptExtractor.extract(bytes, new SpanSink, new MetaSink)
      }
      assert(ex.getMessage.contains("encrypted"), s"len=$len: ${ex.getMessage}")
    }
  }

  test("offsetToCurrentEdit past the stream end fails encrypted cleanly") {
    // a full 20-byte atom whose currentEdit offset points outside the
    // document stream: decryptPpt's bounded record walk returns None
    val bytes = CfbWriter.write(Seq(
      "Current User" -> encryptedCurrentUser(20),
      "PowerPoint Document" -> new Array[Byte](64)))
    val ex = intercept[IllegalArgumentException] {
      PptExtractor.extract(bytes, new SpanSink, new MetaSink)
    }
    assert(ex.getMessage.contains("encrypted"))
  }

  /** Minimal tagged PDF whose structure tree contains a self-referential
    * array object (6 0 obj = [6 0 R]) next to a normal /P element.
    */
  private def selfRefTaggedPdf(): Array[Byte] = {
    val content = "/P <</MCID 0>> BDC BT /F1 12 Tf 72 700 Td (Hello tagged) Tj ET EMC"
    val pdf = new StringBuilder
    pdf.append("%PDF-1.7\n")
    pdf.append("1 0 obj\n<< /Type /Catalog /Pages 2 0 R /StructTreeRoot 5 0 R " +
      "/MarkInfo << /Marked true >> >>\nendobj\n")
    pdf.append("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    pdf.append("3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Resources << /Font << /F1 7 0 R >> >> /Contents 4 0 R >>\nendobj\n")
    pdf.append(s"4 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n")
    pdf.append("5 0 obj\n<< /Type /StructTreeRoot /K [6 0 R 8 0 R] >>\nendobj\n")
    pdf.append("6 0 obj\n[6 0 R]\nendobj\n") // self-referential array
    pdf.append("7 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n")
    pdf.append("8 0 obj\n<< /S /P /Pg 3 0 R /K 0 >>\nendobj\n")
    pdf.append("trailer\n<< /Root 1 0 R >>\n%%EOF\n")
    pdf.toString.getBytes(ISO_8859_1)
  }

  test("self-referential structure-tree array terminates; text still extracted") {
    // before the fix, recursing an array did not increment depth, so
    // 6 0 obj = [6 0 R] recursed forever below the MaxDepth guard
    val sink = new SpanSink()
    PdfExtractor.extract(selfRefTaggedPdf(), sink, new MetaSink,
      markedContent = true)
    val text = sink.result().filter(_.kind == "text").map(_.text).mkString
    assert(text.contains("Hello tagged"), text)
  }
}
