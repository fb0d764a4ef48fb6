package graft

import java.nio.file.{Files, Path}
import graft.core.{DocRow, Span, Status}
import graft.corpus.Corpus
import graft.engine.Extractor
import org.scalatest.funsuite.AnyFunSuite

/** RAR container walk: entry metadata from the reference's real
  * archives (compressed → declared-unsupported, like RarParser minus
  * the licensed decompressor), STORED entries recursing from
  * hand-built RAR4/RAR5 archives.
  */
class RarSpec extends AnyFunSuite {

  private val docs = Path.of("/root/reference/tika-parsers/" +
    "tika-parsers-standard/tika-parsers-standard-modules/" +
    "tika-parser-pkg-module/src/test/resources/test-documents")

  private def extract(name: String, b: Array[Byte]): graft.core.ExtractedDoc =
    Extractor.extract(DocRow(name, Seq(Span("bytes", Corpus.b64(b), null, 0))))

  private def text(d: graft.core.ExtractedDoc): String =
    d.spans.filter(_.kind == graft.core.Span.KindText).map(_.text).mkString("\n")

  test("reference test-documents.rar: v29 entries decode and recurse") {
    val p = docs.resolve("test-documents.rar")
    org.scalatest.Assertions.assume(Files.isRegularFile(p))
    val d = extract("test-documents.rar", Files.readAllBytes(p))
    assert(d.mime == graft.mime.MimeDb.Rar)
    val entries = d.meta.getOrElse("rar:entry", Seq.empty)
    assert(entries.size == 9)
    for (n <- Seq("testEXCEL.xls", "testHTML.html", "testOpenOffice2.odt",
        "testPDF.pdf", "testPPT.ppt", "testRTF.rtf", "testTXT.txt",
        "testWORD.doc", "testXML.xml"))
      assert(entries.exists(_.contains(n)), n)
    // all nine version-29 LZ entries decode (Rar29, incl. the standard
    // VM filter on testEXCEL.xls) and the inner documents extract like
    // RarParserTest expects via junrar; the archived testPPT.ppt itself
    // records an embedded exception (it does standalone too), so the
    // container reports success-with-exception from that child alone
    assert(d.status == Status.ParseSuccess ||
      d.status == Status.ParseSuccessWithException, d.status)
    val t = text(d)
    assert(t.contains("Test d'indexation de Txt"), "txt content")
    assert(t.contains("Sample Excel Worksheet"), "xls content")
    assert(t.contains("Apache Tika"), "pdf content")
  }

  test("decoded v29 payloads match the archive's own CRC32 per entry") {
    val p = docs.resolve("test-documents.rar")
    org.scalatest.Assertions.assume(Files.isRegularFile(p))
    val bytes = Files.readAllBytes(p)
    val ar = graft.pkgx.RarUtil.parse(bytes)
    assert(ar.entries.size == 9)
    // header CRCs, read independently of RarUtil (file header fileCRC
    // field at offset +16)
    def le32(b: Array[Byte], o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    var q = 7
    val crcs = scala.collection.mutable.Map.empty[String, Long]
    while (q + 7 <= bytes.length) {
      val typ = bytes(q + 2) & 0xff
      val flags = (bytes(q + 3) & 0xff) | ((bytes(q + 4) & 0xff) << 8)
      val size = (bytes(q + 5) & 0xff) | ((bytes(q + 6) & 0xff) << 8)
      var add = 0L
      if (typ == 0x74) {
        add = le32(bytes, q + 7)
        val nameLen = (bytes(q + 26) & 0xff) | ((bytes(q + 27) & 0xff) << 8)
        val name = new String(bytes, q + 32, nameLen, "ISO-8859-1")
        crcs(name.substring(name.lastIndexOf('\\') + 1)) = le32(bytes, q + 16)
      } else if ((flags & 0x8000) != 0) add = le32(bytes, q + 7)
      if (typ == 0x7b || size < 7) q = bytes.length else q += size + add.toInt
    }
    for (e <- ar.entries) {
      val short = e.name.substring(e.name.lastIndexOf('\\') + 1)
      // all nine decode byte-exact, incl. testEXCEL.xls whose stream
      // carries a standard VM filter executed natively
      assert(e.stored.isDefined, short)
      assert(e.stored.get.length.toLong == e.unpSize, short)
      val crc = new java.util.zip.CRC32
      crc.update(e.stored.get)
      assert(crc.getValue == crcs(short), s"$short crc")
    }
  }

  test("encrypted rar records an exception") {
    val p = docs.resolve("test-documents-enc.rar")
    org.scalatest.Assertions.assume(Files.isRegularFile(p))
    val d = extract("enc.rar", Files.readAllBytes(p))
    // entries are header-encrypted or flagged: either the whole header
    // area is unreadable (exception) or per-entry encryption is flagged
    assert(d.status != Status.ParseSuccess ||
      d.meta.contains("parse:exception"))
  }

  test("encrypted rar decrypts with the password (exceeds the reference)") {
    // RarParserTest.testEncryptedRar supplies password "ApacheTika" via
    // PasswordProvider and documents that the reference can only throw
    // EncryptedDocumentException; our RAR3 KDF + AES-CBC path decrypts
    // the same fixture, every accepted entry CRC32-validated in RarUtil
    val p = docs.resolve("test-documents-enc.rar")
    org.scalatest.Assertions.assume(Files.isRegularFile(p))
    val bytes = Files.readAllBytes(p)
    val ar = graft.pkgx.RarUtil.parse(bytes, Some("ApacheTika"))
    assert(ar.headersEncrypted)
    assert(ar.entries.nonEmpty, "decrypted header walk found no entries")
    val byName = ar.entries.map(e => e.name -> e).toMap
    assert(byName.keySet.exists(_.contains("testTXT.txt")),
      s"names: ${ar.entries.map(_.name)}")
    // all nine files decrypt AND decode (v29 LZ after AES), each CRC32
    // verified inside RarUtil; the lone directory entry is skipped
    assert(ar.entries.size == 9, ar.entries.map(_.name))
    assert(ar.entries.forall(_.stored.isDefined),
      ar.entries.filter(_.stored.isEmpty).map(_.name))
    for (n <- Seq("testEXCEL.xls", "testHTML.html", "testOpenOffice2.odt",
        "testPDF.pdf", "testPPT.ppt", "testRTF.rtf", "testTXT.txt",
        "testWORD.doc", "testXML.xml"))
      assert(ar.entries.exists(_.name.contains(n)), n)
    // wrong password: walk bails at the first CRC16 mismatch, no entries
    val bad = graft.pkgx.RarUtil.parse(bytes, Some("WrongPassword"))
    assert(bad.entries.isEmpty)
    // end-to-end through the extraction pipeline with the password config
    val d = Extractor.extract(
      DocRow("enc.rar", Seq(Span("bytes", Corpus.b64(bytes), null, 0))),
      Extractor.DefaultConfig.copy(password = Some("ApacheTika")))
    val t = text(d)
    assert(t.contains("Test d'indexation de Txt"), "decrypted txt content")
  }

  private def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
  private def le32(v: Int) =
    Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)

  private def rar4Stored(name: String, data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    out.write(Array[Byte]('R', 'a', 'r', '!', 0x1a, 0x07, 0x00))
    // main header (13 bytes)
    out.write(le16(0)); out.write(0x73); out.write(le16(0)); out.write(le16(13))
    out.write(new Array[Byte](6))
    // file header
    val nameB = name.getBytes("ISO-8859-1")
    val hs = 32 + nameB.length
    out.write(le16(0)); out.write(0x74); out.write(le16(0x8000))
    out.write(le16(hs))
    out.write(le32(data.length)) // packSize
    out.write(le32(data.length)) // unpSize
    out.write(0) // hostOs
    out.write(le32(0)) // fileCrc
    out.write(le32(0)) // ftime
    out.write(20) // unpVer
    out.write(0x30) // method: stored
    out.write(le16(nameB.length))
    out.write(le32(0x20)) // attrs
    out.write(nameB)
    out.write(data)
    // end of archive
    out.write(le16(0)); out.write(0x7b); out.write(le16(0x4000)); out.write(le16(7))
    out.toByteArray
  }

  private def vint(v: Long): Array[Byte] = {
    val b = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var x = v
    while ({ b += ((x & 0x7f) | (if ((x >> 7) != 0) 0x80 else 0)).toByte
      x >>= 7; x != 0 }) ()
    b.toArray
  }

  private def rar5Stored(name: String, data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    out.write(Array[Byte]('R', 'a', 'r', '!', 0x1a, 0x07, 0x01, 0x00))
    def block(header: Array[Byte], payload: Array[Byte]): Unit = {
      out.write(le32(0)) // crc (not verified by the walk)
      out.write(vint(header.length))
      out.write(header)
      out.write(payload)
    }
    // main archive header: type=1, flags=0, archiveFlags=0
    block(Array[Byte](1, 0, 0), Array.emptyByteArray)
    // file header: type=2, hflags=2(data), dataSize, fileFlags=0,
    // unpSize, attrs=0, compInfo=0(stored), hostOs=1, nameLen, name
    val nameB = name.getBytes("UTF-8")
    val h = new java.io.ByteArrayOutputStream
    h.write(2); h.write(2); h.write(vint(data.length))
    h.write(0); h.write(vint(data.length)); h.write(0)
    h.write(0); h.write(1); h.write(vint(nameB.length)); h.write(nameB)
    block(h.toByteArray, data)
    // end header: type=5, flags=0, endFlags=0
    block(Array[Byte](5, 0, 0), Array.emptyByteArray)
    out.toByteArray
  }

  test("RAR4 stored entry recurses and extracts") {
    val d = extract("stored4.rar",
      rar4Stored("hello.txt", "stored rar4 payload text".getBytes("UTF-8")))
    assert(d.status == Status.ParseSuccess)
    assert(text(d).contains("stored rar4 payload text"))
    assert(d.meta.getOrElse("rar:entry", Seq.empty)
      .exists(_.startsWith("hello.txt:")))
  }

  test("RAR5 stored entry recurses and extracts") {
    val d = extract("stored5.rar",
      rar5Stored("hello5.txt", "stored rar5 payload text".getBytes("UTF-8")))
    assert(d.status == Status.ParseSuccess)
    assert(text(d).contains("stored rar5 payload text"))
    assert(d.meta.getOrElse("rar:entry", Seq.empty)
      .exists(_.startsWith("hello5.txt:")))
  }
}
