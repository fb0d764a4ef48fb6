package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random
import graft.core.{DocRow, Span, Status}
import graft.corpus.Corpus
import graft.engine.{Extractor, MetaSink, SpanSink}
import graft.pdf.{PdfCrypto, PdfExtractor}

/** Round-2 PDF features: empty-password RC4 decrypt, FILESPEC embedded
  * files, annotations, acroform, bookmarks.
  */
class PdfCryptoSpec extends AnyFunSuite {

  test("RC4 is an involution and O/U/key derivation round-trips") {
    val key = Array.tabulate[Byte](16)(_.toByte)
    val msg = "attack at dawn".getBytes("UTF-8")
    assert(PdfCrypto.rc4(key, PdfCrypto.rc4(key, msg)).toSeq == msg.toSeq)
    val id0 = Array.tabulate[Byte](16)(i => (i * 7).toByte)
    val o = PdfCrypto.computeO(Array.emptyByteArray, Array.emptyByteArray, 3, 16)
    assert(PdfCrypto.emptyPasswordWorks(o,
      PdfCrypto.computeU(PdfCrypto.fileKey(o, -44L, id0, 3, 16), id0, 3),
      -44L, id0, 3, 16))
  }

  test("encrypted PDF: empty-password decrypt recovers text and title") {
    val r = new Random(21)
    val lines = Seq("Secret content line one", "And the second line")
    // deterministic content via the corpus generator's own path
    val bytes = Corpus.encryptedPdf(r)
    val sink = new SpanSink(); val meta = new MetaSink
    PdfExtractor.extract(bytes, sink, meta)
    val text = sink.result().filter(_.kind == "text").map(_.text).mkString
    assert(text.trim.nonEmpty, "no text decrypted")
    // decrypted text must be printable prose, not RC4 noise
    assert(text.count(c => c.isLetter || c == ' ' || c == '.') > text.length / 2)
    assert(meta.result().contains("pdf:encrypted"))
    assert(meta.result().contains("dc:title"))
    val title = meta.result()("dc:title").head
    assert(title.forall(c => c >= ' ' && c < 127), s"garbled title: $title")
    assert(lines.nonEmpty) // anchor for the seeded generator contract
  }

  test("non-empty-password PDF fails as a recorded parse exception") {
    // flip one byte of /U so the empty password no longer verifies
    val bytes = Corpus.encryptedPdf(new Random(22))
    val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    val uPos = s.indexOf("/U <") + 4
    val corrupted = bytes.clone()
    corrupted(uPos) = if (corrupted(uPos) == '0') '1' else '0'
    val out = Extractor.extract(DocRow("enc1",
      Seq(Span("bytes", Corpus.b64(corrupted), null, 0))))
    assert(out.status == Status.ParseException)
    assert(out.spans.isEmpty)
  }

  test("featured PDF: attachment recursed, annotations/acroform/bookmarks emitted") {
    val bytes = Corpus.featuredPdf(new Random(23))
    val out = Extractor.extract(DocRow("feat1",
      Seq(Span("bytes", Corpus.b64(bytes), null, 0))))
    assert(out.status == Status.ParseSuccess)
    // FILESPEC attachment became an embedded doc with an ordinal id path
    assert(out.spans.exists(s => s.kind == "embedded-open" && s.media_ref == "/1"))
    assert(out.meta("embedded:path").exists(_.endsWith(":notes.txt")))
    val text = out.spans.filter(_.kind == "text").map(_.text).mkString("\n")
    assert(out.meta.contains("pdf:annotation:uri"))
    assert(text.contains("comment:"), s"acroform field missing in: $text")
    // two bookmark titles present
    assert(out.meta("pdf:annotation:uri").head == "http://example.com/ref")
  }

  test("AESV2 (/V 4 /R 4) PDF decrypts with the empty password") {
    val content = "BT\n/F1 12 Tf\n72 712 Td\n(Aes secret payload line) Tj\nET\n"
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val title = "Aes Title"
    val rnd = new Random(31)
    val id0 = Array.tabulate[Byte](16)(_ => rnd.nextInt(256).toByte)
    val p = -44L
    val o = PdfCrypto.computeO(Array.emptyByteArray, Array.emptyByteArray, 4, 16)
    val key = PdfCrypto.fileKey(o, p, id0, 4, 16)
    val u = PdfCrypto.computeU(key, id0, 4)
    def hex(b: Array[Byte]) = b.map(x => f"${x & 0xff}%02x").mkString
    val iv = Array.tabulate[Byte](16)(i => (i * 11 + 3).toByte)
    val encContent = PdfCrypto.aesEncrypt(PdfCrypto.objectKeyAes(key, 5, 0), iv, content)
    val encTitle = PdfCrypto.aesEncrypt(PdfCrypto.objectKeyAes(key, 6, 0), iv,
      title.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit =
      out.write(s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    w("%PDF-1.6\n")
    w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    w("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    w("3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>\nendobj\n")
    w("4 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
      "/Encoding /WinAnsiEncoding >>\nendobj\n")
    w(s"5 0 obj\n<< /Length ${encContent.length} >>\nstream\n")
    out.write(encContent)
    w("\nendstream\nendobj\n")
    w(s"6 0 obj\n<< /Title <${hex(encTitle)}> >>\nendobj\n")
    w("7 0 obj\n<< /Filter /Standard /V 4 /R 4 /Length 128 /P -44 " +
      "/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> /StmF /StdCF /StrF /StdCF " +
      s"/O <${hex(o)}> /U <${hex(u)}> >>\nendobj\n")
    w(s"trailer\n<< /Root 1 0 R /Info 6 0 R /Encrypt 7 0 R " +
      s"/ID [<${hex(id0)}> <${hex(id0)}>] >>\n%%EOF\n")
    val sink = new SpanSink(); val meta = new MetaSink
    PdfExtractor.extract(out.toByteArray, sink, meta)
    val text = sink.result().filter(_.kind == "text").map(_.text).mkString
    assert(text.contains("Aes secret payload line"), s"got: $text")
    assert(meta.result()("dc:title") == Seq("Aes Title"))
    assert(meta.result().contains("pdf:encrypted"))
  }

  test("AES-256 (/V 5 /R 6 AESV3) PDF decrypts with the empty password") {
    // hash2B was additionally validated against a real Adobe-produced
    // R6 file's /U hash (reference testUnicodePassword.pdf, non-empty
    // password) in round-3 dev — the iterated SHA-2 schedule is
    // spec-exact, not merely self-consistent.
    val rnd = new Random(51)
    val fileKey = Array.tabulate[Byte](32)(_ => rnd.nextInt(256).toByte)
    val salts = Array.tabulate[Byte](32)(_ => rnd.nextInt(256).toByte)
    val p = -44L
    val (u, ue, o, oe, perms) = PdfCrypto.computeR6Entries(fileKey, salts, p)
    assert(PdfCrypto.emptyPasswordWorksR6(u, 6))
    assert(PdfCrypto.fileKeyR6(u, ue, 6).toSeq == fileKey.toSeq)
    def hex(b: Array[Byte]) = b.map(x => f"${x & 0xff}%02x").mkString
    val iv = Array.tabulate[Byte](16)(i => (i * 7 + 1).toByte)
    val content = "BT\n/F1 12 Tf\n72 712 Td\n(Aes256 secret r6 line) Tj\nET\n"
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val encContent = PdfCrypto.aesEncrypt(fileKey, iv, content)
    val encTitle = PdfCrypto.aesEncrypt(fileKey, iv,
      "R6 Title".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit =
      out.write(s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    w("%PDF-2.0\n")
    w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    w("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    w("3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>\nendobj\n")
    w("4 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
      "/Encoding /WinAnsiEncoding >>\nendobj\n")
    w(s"5 0 obj\n<< /Length ${encContent.length} >>\nstream\n")
    out.write(encContent)
    w("\nendstream\nendobj\n")
    w(s"6 0 obj\n<< /Title <${hex(encTitle)}> >>\nendobj\n")
    w("7 0 obj\n<< /Filter /Standard /V 5 /R 6 /Length 256 /P -44 " +
      "/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> /StmF /StdCF /StrF /StdCF " +
      s"/O <${hex(o)}> /U <${hex(u)}> /OE <${hex(oe)}> /UE <${hex(ue)}> " +
      s"/Perms <${hex(perms)}> >>\nendobj\n")
    w("trailer\n<< /Root 1 0 R /Info 6 0 R /Encrypt 7 0 R >>\n%%EOF\n")
    val sink = new SpanSink(); val meta = new MetaSink
    PdfExtractor.extract(out.toByteArray, sink, meta)
    val text = sink.result().filter(_.kind == "text").map(_.text).mkString
    assert(text.contains("Aes256 secret r6 line"), s"got: $text")
    assert(meta.result()("dc:title") == Seq("R6 Title"))
    assert(meta.result().contains("pdf:encrypted"))
  }

  test("R6 with a corrupted /U hash fails as non-empty-password") {
    val rnd = new Random(52)
    val fileKey = Array.tabulate[Byte](32)(_ => rnd.nextInt(256).toByte)
    val salts = Array.tabulate[Byte](32)(_ => rnd.nextInt(256).toByte)
    val (u, _, _, _, _) = PdfCrypto.computeR6Entries(fileKey, salts, -44L)
    u(0) = (u(0) ^ 1).toByte
    assert(!PdfCrypto.emptyPasswordWorksR6(u, 6))
  }

  test("ObjStm: objects inside compressed object streams are expanded") {
    // catalog/pages/page/font live INSIDE a FlateDecode'd /Type /ObjStm;
    // only the content stream is a direct object (modern xref-stream
    // layout). The scan alone would find no catalog.
    val content = "BT\n/F1 12 Tf\n72 712 Td\n(Inside objstm text) Tj\nET\n"
    val members = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      3 -> ("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        "/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>"),
      4 -> "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")
    val bodies = members.map(_._2)
    val offsets = bodies.scanLeft(0)((acc, b) => acc + b.length + 1).init
    val header = members.map(_._1).zip(offsets)
      .map { case (n, o) => s"$n $o" }.mkString(" ") + "\n"
    val payload = (header + bodies.mkString("\n") + "\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val first = header.length
    val deflated = Corpus.deflate(payload)
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit =
      out.write(s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    w("%PDF-1.6\n")
    w(s"10 0 obj\n<< /Type /ObjStm /N ${members.size} /First $first " +
      s"/Length ${deflated.length} /Filter /FlateDecode >>\nstream\n")
    out.write(deflated)
    w("\nendstream\nendobj\n")
    w(s"5 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n")
    w("%%EOF\n") // no classic trailer: catalog must be found via ObjStm
    val sink = new SpanSink(); val meta = new MetaSink
    PdfExtractor.extract(out.toByteArray, sink, meta)
    val text = sink.result().filter(_.kind == "text").map(_.text).mkString
    assert(text.contains("Inside objstm text"), s"got: $text")
  }

  test("corpus pdf rows incl. encrypted/featured variants extract cleanly") {
    val pdfIdx = (0L until 1000L).filter(i => Corpus.kindOf(i) == "pdf")
    val enc = pdfIdx.find(_ % 11 == 3).get
    val feat = pdfIdx.find(i => i % 13 == 4 && i % 11 != 3).get
    for (idx <- Seq(enc, feat)) {
      val out = Extractor.extract(Corpus.row(idx))
      assert(out.mime == graft.mime.MediaTypes.Pdf)
      assert(out.status == Status.ParseSuccess, s"pdf row $idx -> ${out.status}")
      assert(out.n_chars > 0)
    }
  }
}
