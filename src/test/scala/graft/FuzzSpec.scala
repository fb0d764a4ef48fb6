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

  /** Round-4c parsers under mutation: a valid PST mailbox and stored
    * RAR/ARJ archives with bit flips, truncations, and spliced tails
    * must classify, never throw or hang.
    */
  test("property: mutated pst/rar/arj payloads never escape the envelope") {
    val rnd = new scala.util.Random(11)
    val pst = graft.corpus.PstCorpus.pstFile(new scala.util.Random(5))
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def le32(v: Int) = le16(v & 0xffff) ++ le16(v >>> 16)
    val payload = ("stored member " * 10).getBytes("UTF-8")
    val rar4 = {
      val o = new java.io.ByteArrayOutputStream
      o.write(Array[Byte]('R', 'a', 'r', '!', 0x1a, 0x07, 0x00))
      o.write(le16(0)); o.write(0x73); o.write(le16(0)); o.write(le16(13))
      o.write(new Array[Byte](6))
      val nm = "a.txt".getBytes("ISO-8859-1")
      o.write(le16(0)); o.write(0x74); o.write(le16(0x8000))
      o.write(le16(32 + nm.length))
      o.write(le32(payload.length)); o.write(le32(payload.length))
      o.write(0); o.write(le32(0)); o.write(le32(0)); o.write(20); o.write(0x30)
      o.write(le16(nm.length)); o.write(le32(0x20)); o.write(nm); o.write(payload)
      o.write(le16(0)); o.write(0x7b); o.write(le16(0x4000)); o.write(le16(7))
      o.toByteArray
    }
    val arj = {
      val o = new java.io.ByteArrayOutputStream
      def hdr(method: Int, size: Int, name: String): Unit = {
        val nm = name.getBytes("ISO-8859-1")
        val basic = Array[Byte](30, 11, 1, 0, 0, method.toByte, 0, 0) ++
          le32(0) ++ le32(size) ++ le32(size) ++ le32(0) ++ le16(0) ++
          le16(0) ++ le16(0) ++ nm ++ Array[Byte](0, 0)
        o.write(0x60); o.write(0xea); o.write(le16(basic.length))
        o.write(basic); o.write(le32(0)); o.write(le16(0))
      }
      hdr(0, 0, "t.arj"); hdr(0, payload.length, "a.txt"); o.write(payload)
      o.write(0x60); o.write(0xea); o.write(le16(0))
      o.toByteArray
    }
    val seeds = Seq(pst, rar4, arj)
    seeds.foreach { valid =>
      (0 until 90).foreach { i =>
        val mutated = valid.clone()
        i % 3 match {
          case 0 =>
            val p = rnd.nextInt(mutated.length)
            mutated(p) = (mutated(p) ^ (1 << rnd.nextInt(8))).toByte
          case 1 =>
            val n = 1 + rnd.nextInt(mutated.length)
            val out = Extractor.extract(DocRow("f",
              Seq(Span("bytes", Corpus.b64(java.util.Arrays.copyOf(mutated, n)), null, 0))))
            assert(out.status != null && out.mime != null)
          case _ =>
            val p = rnd.nextInt(mutated.length)
            (p until mutated.length).foreach(j => mutated(j) = rnd.nextInt(256).toByte)
        }
        val out = Extractor.extract(DocRow("f",
          Seq(Span("bytes", Corpus.b64(mutated), null, 0))))
        assert(out.status != null && out.mime != null)
      }
    }
  }

  /** Round-4d parsers under mutation: fixed-layout packages (XPS),
    * metafiles (EMF/WMF), Office 2003 XML, and a Visio OOXML zip with
    * bit flips, truncations, and spliced tails must classify, never
    * throw or hang.
    */
  test("property: mutated xps/emf/wmf/xml2003/vsdx payloads never escape the envelope") {
    val rnd = new scala.util.Random(17)
    val wordml =
      ("""<?xml version="1.0"?><?mso-application progid="Word.Document"?>""" +
       """<w:wordDocument xmlns:w="http://schemas.microsoft.com/office/word/2003/wordml">""" +
       """<w:body><w:p><w:r><w:t>fuzz seed paragraph</w:t></w:r></w:p>""" +
       """<w:tbl><w:tr><w:tc><w:p><w:r><w:t>cell</w:t></w:r></w:p></w:tc></w:tr></w:tbl>""" +
       """</w:body></w:wordDocument>""").getBytes("UTF-8")
    val ssml =
      ("""<?xml version="1.0"?><Workbook xmlns="urn:schemas-microsoft-com:office:spreadsheet" """ +
       """xmlns:ss="urn:schemas-microsoft-com:office:spreadsheet"><Worksheet ss:Name="S1">""" +
       """<Table><Row><Cell><Data ss:Type="String">fuzz</Data></Cell></Row></Table>""" +
       """</Worksheet></Workbook>""").getBytes("UTF-8")
    val vsdx = Corpus.zip(Seq(
      "[Content_Types].xml" ->
        """<Types xmlns="a"><Default Extension="xml" ContentType="application/vnd.ms-visio.drawing.main+xml"/></Types>""".getBytes("UTF-8"),
      "_rels/.rels" ->
        ("""<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
         """<Relationship Id="R1" Type="http://schemas.microsoft.com/visio/2010/relationships/document" Target="/visio/document.xml"/></Relationships>""").getBytes("UTF-8"),
      "visio/document.xml" -> "<VisioDocument/>".getBytes("UTF-8"),
      "visio/_rels/document.xml.rels" ->
        ("""<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
         """<Relationship Id="R1" Type="http://schemas.microsoft.com/visio/2010/relationships/pages" Target="pages/pages.xml"/></Relationships>""").getBytes("UTF-8"),
      "visio/pages/pages.xml" -> "<Pages/>".getBytes("UTF-8"),
      "visio/pages/_rels/pages.xml.rels" ->
        ("""<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
         """<Relationship Id="R1" Type="http://schemas.microsoft.com/visio/2010/relationships/page" Target="page1.xml"/></Relationships>""").getBytes("UTF-8"),
      "visio/pages/page1.xml" ->
        """<PageContents><Shape><Text>fuzz shape</Text></Shape></PageContents>""".getBytes("UTF-8")))
    val seeds = Seq(
      graft.corpus.FixedCorpus.xps(new scala.util.Random(3)),
      graft.corpus.FixedCorpus.emf(new scala.util.Random(4)),
      graft.corpus.FixedCorpus.wmf(new scala.util.Random(5)),
      wordml, ssml, vsdx)
    seeds.foreach { valid =>
      (0 until 60).foreach { i =>
        val mutated = valid.clone()
        i % 3 match {
          case 0 =>
            val p = rnd.nextInt(mutated.length)
            mutated(p) = (mutated(p) ^ (1 << rnd.nextInt(8))).toByte
          case 1 =>
            val n = 1 + rnd.nextInt(mutated.length)
            val out = Extractor.extract(DocRow("f",
              Seq(Span("bytes", Corpus.b64(java.util.Arrays.copyOf(mutated, n)), null, 0))))
            assert(out.status != null && out.mime != null)
          case _ =>
            val p = rnd.nextInt(mutated.length)
            (p until mutated.length).foreach(j => mutated(j) = rnd.nextInt(256).toByte)
        }
        val out = Extractor.extract(DocRow("f",
          Seq(Span("bytes", Corpus.b64(mutated), null, 0))))
        assert(out.status != null && out.mime != null)
      }
    }
  }

  /** Round-4h parsers under mutation: SAS7BDAT, ENVI headers, flat
    * ODF, Word 2006 ML packages, and RTF rows carrying embedded
    * objdata/pict payloads.
    */
  test("property: mutated sas/envi/fodt/2006ml/rtf-embedded payloads never escape the envelope") {
    val rnd = new scala.util.Random(41)
    val ml2006 =
      ("""<?xml version="1.0"?><?mso-application progid="Word.Document"?>""" +
       """<pkg:package xmlns:pkg="http://schemas.microsoft.com/office/2006/xmlPackage">""" +
       """<pkg:part pkg:name="/word/document.xml" pkg:contentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml">""" +
       """<pkg:xmlData><w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">""" +
       """<w:body><w:p><w:r><w:t>fuzz 2006ml text</w:t></w:r></w:p></w:body></w:document></pkg:xmlData></pkg:part>""" +
       """<pkg:part pkg:name="/word/media/x.bin" pkg:contentType="application/octet-stream">""" +
       """<pkg:binaryData>AAECAwQF</pkg:binaryData></pkg:part></pkg:package>""").getBytes("UTF-8")
    val sasFixture = {
      val p = java.nio.file.Path.of("/root/reference/tika-parsers/" +
        "tika-parsers-standard/tika-parsers-standard-modules/" +
        "tika-parser-code-module/src/test/resources/test-documents/testSAS.sas7bdat")
      if (java.nio.file.Files.isRegularFile(p))
        Seq(java.nio.file.Files.readAllBytes(p)) else Nil
    }
    val seeds = sasFixture ++ Seq(
      Corpus.enviDoc(new scala.util.Random(31)),
      Corpus.fodtDoc(new scala.util.Random(32)),
      ml2006,
      Corpus.rtfDoc(new scala.util.Random(33), 5), // objdata row
      Corpus.rtfDoc(new scala.util.Random(34), 1)) // pict row
    seeds.foreach { valid =>
      (0 until 60).foreach { i =>
        val mutated = valid.clone()
        i % 3 match {
          case 0 =>
            val p = rnd.nextInt(mutated.length)
            mutated(p) = (mutated(p) ^ (1 << rnd.nextInt(8))).toByte
          case 1 =>
            val n = 1 + rnd.nextInt(mutated.length)
            val out = Extractor.extract(DocRow("f",
              Seq(Span("bytes", Corpus.b64(java.util.Arrays.copyOf(mutated, n)), null, 0))))
            assert(out.status != null && out.mime != null)
          case _ =>
            val p = rnd.nextInt(mutated.length)
            (p until mutated.length).foreach(j => mutated(j) = rnd.nextInt(256).toByte)
        }
        val out = Extractor.extract(DocRow("f",
          Seq(Span("bytes", Corpus.b64(mutated), null, 0))))
        assert(out.status != null && out.mime != null)
      }
    }
  }

  test("property: mutated xlsb/pub/vsd/media payloads never escape the envelope") {
    val rnd = new scala.util.Random(23)
    val seeds = Seq(
      graft.corpus.MsBinCorpus.xlsbFile(new scala.util.Random(6)),
      graft.corpus.MsBinCorpus.pubFile(new scala.util.Random(7)),
      graft.corpus.MsBinCorpus.vsdFile(new scala.util.Random(8)),
      graft.corpus.MediaCorpus.jpeg(new scala.util.Random(9)),
      graft.corpus.MediaCorpus.png(new scala.util.Random(10)))
    seeds.foreach { valid =>
      (0 until 60).foreach { i =>
        val mutated = valid.clone()
        i % 3 match {
          case 0 =>
            val pos = rnd.nextInt(mutated.length)
            mutated(pos) = (mutated(pos) ^ (1 << rnd.nextInt(8))).toByte
          case 1 =>
            val n = 1 + rnd.nextInt(mutated.length)
            val out = Extractor.extract(DocRow("f",
              Seq(Span("bytes", Corpus.b64(java.util.Arrays.copyOf(mutated, n)), null, 0))))
            assert(out.status != null && out.mime != null)
          case _ =>
            val pos = rnd.nextInt(mutated.length)
            (pos until mutated.length).foreach(j => mutated(j) = rnd.nextInt(256).toByte)
        }
        val out = Extractor.extract(DocRow("f",
          Seq(Span("bytes", Corpus.b64(mutated), null, 0))))
        assert(out.status != null && out.mime != null)
      }
    }
  }

  /** Round-4i paths under mutation: JPEG XL fixtures (bare codestream +
    * BMFF container with Exif/xml boxes) and the real CMS fixtures
    * (signed DER, compressed zlib) with bit flips, truncations, and
    * spliced tails must classify, never throw or hang.
    */
  test("property: mutated jxl/cms payloads never escape the envelope") {
    import java.nio.file.{Files, Path}
    val rnd = new scala.util.Random(11)
    val img = Path.of("/root/reference/tika-parsers/tika-parsers-standard/" +
      "tika-parsers-standard-modules/tika-parser-image-module/" +
      "src/test/resources/test-documents")
    val crypto = Path.of("/root/reference/tika-parsers/" +
      "tika-parsers-standard/tika-parsers-standard-modules/" +
      "tika-parser-crypto-module/src/test/resources/test-documents")
    val candidates = Seq(
      img.resolve("testJXL.jxl"), img.resolve("testJXL_ISOBMFF.jxl"),
      img.resolve("testJXL_exif.jxl"),
      crypto.resolve("testPKCS7_signed_data_def.p7m"),
      crypto.resolve("testPKCS7_compressed_def_long.p7z"),
      crypto.resolve("testPKCS7_compressed_ind.p7z"),
      // exercises the Rar29 LZ decoder against corrupt streams
      java.nio.file.Path.of("/root/reference/tika-parsers/" +
        "tika-parsers-standard/tika-parsers-standard-modules/" +
        "tika-parser-pkg-module/src/test/resources/test-documents/" +
        "test-documents.rar"))
    val seeds = candidates.filter(Files.isRegularFile(_)).map(Files.readAllBytes)
    org.scalatest.Assertions.assume(seeds.nonEmpty, "reference fixtures absent")
    seeds.foreach { valid =>
      (0 until 60).foreach { i =>
        val mutated = valid.clone()
        i % 3 match {
          case 0 =>
            val pos = rnd.nextInt(mutated.length)
            mutated(pos) = (mutated(pos) ^ (1 << rnd.nextInt(8))).toByte
          case 1 =>
            val n = 1 + rnd.nextInt(mutated.length)
            val out = Extractor.extract(DocRow("f",
              Seq(Span("bytes", Corpus.b64(java.util.Arrays.copyOf(mutated, n)), null, 0))))
            assert(out.status != null && out.mime != null)
          case _ =>
            val pos = rnd.nextInt(mutated.length)
            (pos until mutated.length).foreach(j => mutated(j) = rnd.nextInt(256).toByte)
        }
        val out = Extractor.extract(DocRow("f",
          Seq(Span("bytes", Corpus.b64(mutated), null, 0))))
        assert(out.status != null && out.mime != null)
      }
    }
  }

  /** Round-4l paths under mutation: the v23 ID3+APIC mp3 and ilst mp4
    * corpus rows, plus real Ogg (vorbis comments + cover pages), FLV
    * (AMF0 metadata), and BPG fixtures when present — bit flips,
    * truncations, and spliced random tails must classify, never throw
    * or spin (the Ogg packet reassembler, APIC/picture walks, AMF
    * reader, and ue7 decoder all run on these bytes).
    */
  test("property: mutated id3/ogg/flv/bpg payloads never escape the envelope") {
    val av = java.nio.file.Path.of("/root/reference/tika-parsers/" +
      "tika-parsers-standard/tika-parsers-standard-modules/" +
      "tika-parser-audiovideo-module/src/test/resources/test-documents")
    val img = java.nio.file.Path.of("/root/reference/tika-parsers/" +
      "tika-parsers-standard/tika-parsers-standard-modules/" +
      "tika-parser-image-module/src/test/resources/test-documents")
    def fixture(dir: java.nio.file.Path, n: String): Seq[Array[Byte]] =
      if (java.nio.file.Files.isRegularFile(dir.resolve(n)))
        Seq(java.nio.file.Files.readAllBytes(dir.resolve(n)))
      else Nil
    val rnd = new scala.util.Random(31)
    val seeds = Seq(
      graft.corpus.MediaCorpus.mp3(new scala.util.Random(11)),
      graft.corpus.MediaCorpus.mp4(new scala.util.Random(12))) ++
      fixture(av, "testVORBIS_twoCovers.ogg") ++
      fixture(av, "testFLAC.oga") ++
      fixture(av, "testFLV.flv") ++
      fixture(img, "testBPG.bpg")
    seeds.foreach { valid =>
      (0 until 60).foreach { i =>
        val mutated = valid.clone()
        i % 3 match {
          case 0 =>
            val pos = rnd.nextInt(mutated.length)
            mutated(pos) = (mutated(pos) ^ (1 << rnd.nextInt(8))).toByte
          case 1 =>
            val n = 1 + rnd.nextInt(mutated.length)
            val out = Extractor.extract(DocRow("f",
              Seq(Span("bytes", Corpus.b64(java.util.Arrays.copyOf(mutated, n)), null, 0))))
            assert(out.status != null && out.mime != null)
          case _ =>
            val pos = rnd.nextInt(mutated.length)
            (pos until mutated.length).foreach(j => mutated(j) = rnd.nextInt(256).toByte)
        }
        val out = Extractor.extract(DocRow("f",
          Seq(Span("bytes", Corpus.b64(mutated), null, 0))))
        assert(out.status != null && out.mime != null)
      }
    }
  }

  test("property: mutated brotli / ANSI-PST payloads never escape the envelope") {
    val rnd = new scala.util.Random(41)
    def res(n: String): Array[Byte] = {
      val in = getClass.getResourceAsStream(s"/brotli/$n")
      try in.readAllBytes() finally in.close()
    }
    // (bytes, name) — brotli is name-detected (no magic), so the .br
    // route only fires under its glob, exactly like the reference
    val seeds = Seq(
      (res("dicttext.br"), "f.br"), (res("big.br"), "f.br"),
      (res("rep.br"), "f.br"),
      (graft.corpus.PstCorpus.pstFileAnsi(new scala.util.Random(9)), "f.pst"))
    seeds.foreach { case (valid, name) =>
      (0 until 80).foreach { i =>
        val mutated = valid.clone()
        i % 3 match {
          case 0 =>
            val pos = rnd.nextInt(mutated.length)
            mutated(pos) = (mutated(pos) ^ (1 << rnd.nextInt(8))).toByte
          case 1 =>
            val n = 1 + rnd.nextInt(mutated.length)
            val out = Extractor.extract(DocRow(name,
              Seq(Span("bytes", Corpus.b64(java.util.Arrays.copyOf(mutated, n)), null, 0))))
            assert(out.status != null && out.mime != null)
          case _ =>
            val pos = rnd.nextInt(mutated.length)
            (pos until mutated.length).foreach(j => mutated(j) = rnd.nextInt(256).toByte)
        }
        val out = Extractor.extract(DocRow(name,
          Seq(Span("bytes", Corpus.b64(mutated), null, 0))))
        assert(out.status != null && out.mime != null)
        // the decoder itself: bounded output or a clean malformed error
        if (name == "f.br")
          try assert(graft.pkgx.Brotli.decompress(mutated).length <= (256 << 20))
          catch { case _: graft.pkgx.Brotli.BrotliMalformed => () }
      }
    }
  }

  test("property: mutated encrypted / tagged payloads never escape the envelope") {
    // the r5 crypto + marked-content routes: a flipped bit anywhere in
    // an EncryptionInfo header, a CryptoAPI RC4 stream, an agile XML
    // descriptor, a PDF /Encrypt dict, or a /StructTreeRoot must land
    // on a clean per-document status, never a throw — and the supplied
    // password must not widen the attack surface (reference behavior:
    // a corrupted protected file throws EncryptedDocumentException /
    // IOException inside the parser, which tika catches per document)
    val base = "/root/reference/tika-parsers/tika-parsers-standard/" +
      "tika-parsers-standard-modules/"
    val ms = java.nio.file.Path.of(base +
      "tika-parser-microsoft-module/src/test/resources/test-documents")
    val pdfs = java.nio.file.Path.of(base +
      "tika-parser-pdf-module/src/test/resources/test-documents")
    org.scalatest.Assertions.assume(
      java.nio.file.Files.isDirectory(ms) &&
        java.nio.file.Files.isDirectory(pdfs),
      "reference fixtures not present")
    val rnd = new scala.util.Random(43)
    // (dir, fixture, password, extractMarkedContent)
    val seeds = Seq(
      (ms, "testWORD_protected_passtika.docx", Some("tika"), false),
      (ms, "testEXCEL_protected_passtika.xlsx", Some("tika"), false),
      (ms, "testPPT_protected_passtika.ppt", Some("tika"), false),
      (ms, "testEXCEL_protected_passtika.xls", Some("tika"), false),
      (ms, "testWORD_protected_passtika.doc", Some("tika"), false),
      (pdfs, "testPDF_no_extract_no_accessibility_owner_user.pdf",
        Some("user"), false),
      (pdfs, "testJournalParser.pdf", None, true))
    seeds.foreach { case (dir, name, password, marked) =>
      val p = dir.resolve(name)
      org.scalatest.Assertions.assume(java.nio.file.Files.isRegularFile(p),
        s"missing fixture $name")
      val valid = java.nio.file.Files.readAllBytes(p)
      val cfg = Extractor.DefaultConfig.copy(
        password = password, extractMarkedContent = marked)
      (0 until 48).foreach { i =>
        val mutated = valid.clone()
        i % 3 match {
          case 0 => // single bit flip anywhere
            val pos = rnd.nextInt(mutated.length)
            mutated(pos) = (mutated(pos) ^ (1 << rnd.nextInt(8))).toByte
          case 1 => // truncation
            val n = 1 + rnd.nextInt(mutated.length)
            val out = Extractor.extract(DocRow(name, Seq(Span("bytes",
              Corpus.b64(java.util.Arrays.copyOf(mutated, n)), null, 0))), cfg)
            assert(out.status != null && out.mime != null)
          case _ => // garbage tail from a random point
            val pos = rnd.nextInt(mutated.length)
            (pos until mutated.length).foreach(j => mutated(j) = rnd.nextInt(256).toByte)
        }
        val out = Extractor.extract(DocRow(name,
          Seq(Span("bytes", Corpus.b64(mutated), null, 0))), cfg)
        assert(out.status != null && out.mime != null)
      }
    }
  }

  /** Round-5 encrypted-zip routes under mutation: ZipCrypto and WinZip
    * AES archives with bit flips, truncations, and spliced tails must
    * classify under BOTH the no-password and right-password configs —
    * a mutated salt/verifier/HMAC region must reject cleanly, never
    * throw, hang, or emit unauthenticated plaintext as success.
    */
  test("property: mutated encrypted-zip payloads never escape the envelope") {
    val rnd = new scala.util.Random(17)
    def res(name: String): Array[Byte] = {
      val in = getClass.getResourceAsStream(s"/zipcrypto/$name")
      assert(in != null, s"missing fixture $name")
      try in.readAllBytes() finally in.close()
    }
    val seeds = Seq(
      (res("enc_deflate.zip"), Some("tika-zc")),
      (res("ae_mixed.zip"), Some("tika-ae")),
      (res("mixed.zip"), Some("s3cret!")))
    seeds.foreach { case (valid, password) =>
      for (cfgPw <- Seq(None, password)) {
        val cfg = Extractor.DefaultConfig.copy(password = cfgPw)
        (0 until 36).foreach { i =>
          val mutated = valid.clone()
          i % 3 match {
            case 0 =>
              val pos = rnd.nextInt(mutated.length)
              mutated(pos) = (mutated(pos) ^ (1 << rnd.nextInt(8))).toByte
            case 1 =>
              val n = 1 + rnd.nextInt(mutated.length)
              val out = Extractor.extract(DocRow("z.zip", Seq(Span("bytes",
                Corpus.b64(java.util.Arrays.copyOf(mutated, n)), null, 0))), cfg)
              assert(out.status != null && out.mime != null)
            case _ =>
              val pos = rnd.nextInt(mutated.length)
              (pos until mutated.length).foreach(j =>
                mutated(j) = rnd.nextInt(256).toByte)
          }
          val out = Extractor.extract(DocRow("z.zip",
            Seq(Span("bytes", Corpus.b64(mutated), null, 0))), cfg)
          assert(out.status != null && out.mime != null)
        }
      }
    }
  }

}
