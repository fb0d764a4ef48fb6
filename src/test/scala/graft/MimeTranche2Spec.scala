package graft

import java.nio.file.{Files, Path}
import graft.mime.{MimeDb, MimeRegistry}
import org.scalatest.funsuite.AnyFunSuite

/** Round-3 second magic tranche: crafted-prefix checks for every new
  * signature plus real-fixture checks for the families the reference
  * test corpus carries (ogg codecs, ASF, PST).
  */
class MimeTranche2Spec extends AnyFunSuite {

  private def det(bytes: Array[Byte]): String = MimeRegistry.detect(bytes, None)
  private def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
  private def s(str: String): Array[Byte] =
    str.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)

  test("crafted prefixes hit every new signature") {
    def ogg(codec: Array[Byte]): Array[Byte] =
      s("OggS") ++ new Array[Byte](24) ++ codec
    assert(det(ogg(b(0x01) ++ s("vorbis"))) == MimeDb.OggVorbis)
    assert(det(ogg(s("OpusHead"))) == MimeDb.OggOpus)
    assert(det(ogg(b(0x80) ++ s("theora"))) == MimeDb.OggTheora)
    assert(det(ogg(s("Speex   "))) == MimeDb.OggSpeex)
    assert(det(ogg(b(0x7f) ++ s("FLAC"))) == MimeDb.OggFlacA)
    assert(det(ogg(s("unknowncodec"))) == graft.mime.MediaTypes.Ogg)

    assert(det(b(0x30, 0x26, 0xb2, 0x75, 0x8e, 0x66)) == MimeDb.Asf)
    assert(det(s("!BDN") ++ new Array[Byte](4) ++ s("SM")) == MimeDb.Pst)
    assert(det(b(0x78, 0x9f, 0x3e, 0x22, 0x01)) == MimeDb.Tnef)
    assert(det(s("-----BEGIN CERTIFICATE-----\nMIIB")) == MimeDb.PemCert)
    assert(det(b(0x1f, 0x9d, 0x90)) == MimeDb.UnixCompress)
    assert(det(b(0xf7, 0x02, 0x01)) == MimeDb.Dvi)
    assert(det(s("%!PS-AdobeFont-1.0: Times")) == MimeDb.Type1Font)
    assert(det(b(0x80, 0x01, 0, 0, 0, 0) ++ s("%!PS-AdobeFont")) == MimeDb.Type1Font)
    assert(det(s("bplist00") ++ b(0xd0)) == MimeDb.BPlist)
    assert(det(new Array[Byte](8) ++ b(0x02, 0x00, 0x02, 0x00) ++
      new Array[Byte](22) ++ b(0x4c, 0x50)) == MimeDb.Eot)
    assert(det(s("(This file must be converted with BinHex 4.0)")) == MimeDb.BinHex)
    assert(det(s("filedesc://archive.arc 0.0.0.0")) == MimeDb.ArcArchive)
    assert(det(s("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>")) ==
      MimeDb.HttpResponse)
    assert(det(s("icns") ++ b(0, 0, 1, 0)) == MimeDb.Icns)
    assert(det(b(0x42, 0x50, 0x47, 0xfb)) == MimeDb.Bpg)
    assert(det(b(0x0a, 0x05, 0x01, 0x08)) == MimeDb.Pcx)
    assert(det(s("P7\n") ++ s("WIDTH 1\n")) == MimeDb.Pam)
    assert(det(b(0x01, 0xda, 0x01, 0x01, 0x00, 0x03)) == MimeDb.SgiRgb)
    assert(det(s("II") ++ b(0x2a, 0x00, 0x10, 0, 0, 0) ++ s("CR")) == MimeDb.CanonCr2)
    // plain TIFF must still win without the CR marker
    assert(det(s("II") ++ b(0x2a, 0x00, 0x10, 0, 0, 0, 0, 0)) ==
      graft.mime.MediaTypes.Tiff)
    assert(det(b(0x8a) ++ s("MNG\r\n")) == MimeDb.Mng)
    assert(det(b(0x8b) ++ s("JNG\r\n")) == MimeDb.Jng)
    assert(det(s("caff") ++ b(0x00, 0x01)) == MimeDb.Caf)
    assert(det(s("#!AMR-WB\n")) == MimeDb.AmrWb)
    assert(det(s("PSID") ++ b(0, 2)) == MimeDb.Sid)
    assert(det(b(0x2e, 0x72, 0x61, 0xfd)) == MimeDb.RealAudio)
    assert(det(s("WEBVTT\n\n00:00.000")) == MimeDb.Vtt)
    assert(det(s("(DWF V06.00)")) == MimeDb.Dwf)
    assert(det(s("AC1027rest")) == MimeDb.Dwg)
    assert(det(s("NES") ++ b(0x1a, 4)) == MimeDb.NesRom)
    assert(det(new Array[Byte](20) ++ b(0xdc, 0xa7, 0xc4, 0xfd)) == MimeDb.Zoo)
    assert(det(s("StuffIt (c)1997")) == MimeDb.StuffIt)
    assert(det(b(0x00, 0x00, 0x27, 0x0a) ++ new Array[Byte](96)) == MimeDb.Shapefile)
    assert(det(new Array[Byte](84) ++ s("SAS FILE")) == MimeDb.SasData)
    assert(det(s("$FL2@(#) SPSS DATA FILE")) == MimeDb.SpssSav)
    assert(det(s("<stata_dta><header>")) == MimeDb.StataDta)
    assert(det(b(0xfe, 0xed, 0xfe, 0xed, 0, 0)) == MimeDb.Jks)
    assert(det(s("HWP Document File V3.00")) == MimeDb.Hwp)
    assert(det(b(0x0b, 0x77, 0x10)) == MimeDb.Ac3)
    assert(det(s("SDPX") ++ b(0, 0, 1, 0)) == MimeDb.Dpx)
    assert(det(s("NITF02.10")) == MimeDb.Nitf)
    assert(det(s("ASTM-E57")) == MimeDb.E57)
    assert(det(b(0x5a, 0x49, 0x4d, 0x04)) == MimeDb.Zim)
    // r4: refined to the format= parameter (tika-mimetypes.xml btree/hash)
    assert(det(new Array[Byte](12) ++ b(0x62, 0x31, 0x05, 0x00)) == MimeDb.BdbBtree)
    assert(det(s("diff --git a/x b/x\n")) == MimeDb.Diff)
  }

  test("real reference fixtures detect as their codec subtypes") {
    val av = Path.of("/root/reference/tika-parsers/tika-parsers-standard/" +
      "tika-parsers-standard-modules/tika-parser-audiovideo-module/" +
      "src/test/resources/test-documents")
    val ms = Path.of("/root/reference/tika-parsers/tika-parsers-standard/" +
      "tika-parsers-standard-modules/tika-parser-microsoft-module/" +
      "src/test/resources/test-documents")
    org.scalatest.Assertions.assume(Files.isDirectory(av) &&
      Files.isDirectory(ms), "reference fixtures not present")
    def d(p: Path) = det(Files.readAllBytes(p))
    assert(d(av.resolve("testVORBIS.ogg")) == MimeDb.OggVorbis)
    assert(d(ms.resolve("testPST.pst")) == MimeDb.Pst)
    val itest = Path.of("/root/reference/tika-parsers/tika-parsers-standard/" +
      "tika-parsers-standard-integration-tests/src/test/resources/test-documents")
    if (Files.isDirectory(itest)) {
      assert(d(itest.resolve("testWMA.wma")) == MimeDb.Asf)
      assert(d(itest.resolve("testOPUS.opus")) == MimeDb.OggOpus)
    }
  }

  test("ogg/asf metadata parses from the real fixtures") {
    val av = Path.of("/root/reference/tika-parsers/tika-parsers-standard/" +
      "tika-parsers-standard-modules/tika-parser-audiovideo-module/" +
      "src/test/resources/test-documents")
    org.scalatest.Assertions.assume(Files.isDirectory(av),
      "reference fixtures not present")
    val m = graft.media.MediaParser
      .parse(Files.readAllBytes(av.resolve("testVORBIS.ogg"))).get
    assert(m.sampleRate == 44100 && m.channels == 2)
    val it = Path.of("/root/reference/tika-parsers/tika-parsers-standard/" +
      "tika-parsers-standard-integration-tests/src/test/resources/test-documents")
    if (Files.isDirectory(it)) {
      val wma = graft.media.MediaParser
        .parse(Files.readAllBytes(it.resolve("testWMA.wma"))).get
      assert(wma.durationMs > 3000 && wma.durationMs < 15000)
    }
  }

  test("raw http responses strip the head and extract the body") {
    val resp = s("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
      "<html><body><p>captured page body</p></body></html>")
    val out = graft.engine.Extractor.extract(graft.core.DocRow("h",
      Seq(graft.core.Span("bytes", graft.corpus.Corpus.b64(resp), null, 0))))
    assert(out.mime == MimeDb.HttpResponse)
    assert(out.meta("http:status") == Seq("200"))
    val text = out.spans.filter(_.kind == graft.core.Span.KindText)
      .map(_.text).mkString
    assert(text.contains("captured page body"))
    assert(!text.contains("Content-Type")) // head is metadata, not text
  }

  test("new media types flow through extraction as media spans") {
    val ogg = s("OggS") ++ new Array[Byte](24) ++ s("OpusHead") ++
      new Array[Byte](64)
    val out = graft.engine.Extractor.extract(graft.core.DocRow("m",
      Seq(graft.core.Span("bytes", graft.corpus.Corpus.b64(ogg), null, 0))))
    assert(out.mime == MimeDb.OggOpus)
    assert(out.spans.exists(_.kind == graft.core.Span.KindMedia))
  }
}
