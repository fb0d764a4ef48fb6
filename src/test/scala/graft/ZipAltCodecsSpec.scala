package graft

import org.scalatest.funsuite.AnyFunSuite
import java.util.Base64

/** Alternate zip member codecs the reference reads via commons-compress
  * ZipFile: bzip2 (method 12), LZMA (14), zstd (93), XZ (95). The
  * bzip2/LZMA/XZ payloads below are FROZEN outputs of the real
  * reference encoders (CPython's bundled libbz2/liblzma); the zstd
  * member is produced at test time by the independent zstd-jni native
  * library on the Spark classpath — all four are genuine cross-
  * implementation interop checks against the in-tree decoders.
  */
class ZipAltCodecsSpec extends AnyFunSuite {

  private val plain =
    ("Alternate zip codec member content, repeated for compressibility. " * 40)
      .getBytes("UTF-8")
  private val plainCrc = 0xd86c28e6L

  private val bz2Blob = Base64.getDecoder.decode(
    "QlpoOTFBWSZTWYG+SoIAANuVgEAFIAA/J9wwMAEYAUDTQyMmIUDTQyMmIFKpqnpPTRlNiamBPgnATUTUT9E9CdCfRNRORMxOROBMCZirIToTQTYT2JgTQTITYTgTAmBPIn0TMTsTsTYToTcTQTcTUT8EwJyKuxNBMxNxPAmBNBPgmBNxMhOBOwmQm4monAnkT/F3JFOFCQgb5Kgg")

  private val lzma14Blob = Base64.getDecoder.decode(
    "FAkFAF0AAIAAACCbCoZnkCoAVUEXcsyIXz4hpe3zprNueAc7Dam+q24y847wSEo6K1RnSJnGOHIeVLQnRyiUBujHsFBQoQ2v/BoVeFG4cbizJ79LFDXMG1Og9/9+00AA")

  private val xzBlob = Base64.getDecoder.decode(
    "/Td6WFoAAATm1rRGAgAhARYAAAB0L+Wj4ApPAFBdACCbCoZnkCoAVUEXcsyIXz4hpe3zprNueAc7Dam+q24y847wSEo6K1RnSJnGOHIeVLQnRyiUBujHsFBQoQ2v/BoVeFG4cbizJ79LFDXLGIEAAGLg354lPiBJAAFs0BQAAABtpO3qscRn+wIAAAAABFla")

  private def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
  private def le32(v: Long) =
    Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)

  /** minimal zip with one member of an arbitrary method id */
  private def zipWith(name: String, method: Int, comp: Array[Byte],
      uncompLen: Int, crc: Long): Array[Byte] = {
    val nameB = name.getBytes("UTF-8")
    val out = new java.io.ByteArrayOutputStream
    val localOff = 0
    out.write(le32(0x04034b50L))
    out.write(le16(20)); out.write(le16(0)); out.write(le16(method))
    out.write(le16(0)); out.write(le16(0))
    out.write(le32(crc)); out.write(le32(comp.length)); out.write(le32(uncompLen))
    out.write(le16(nameB.length)); out.write(le16(0))
    out.write(nameB); out.write(comp)
    val cenOff = out.size()
    out.write(le32(0x02014b50L))
    out.write(le16(20)); out.write(le16(20)); out.write(le16(0))
    out.write(le16(method)); out.write(le16(0)); out.write(le16(0))
    out.write(le32(crc)); out.write(le32(comp.length)); out.write(le32(uncompLen))
    out.write(le16(nameB.length)); out.write(le16(0)); out.write(le16(0))
    out.write(le16(0)); out.write(le16(0)); out.write(le32(0))
    out.write(le32(localOff))
    out.write(nameB)
    val cenSize = out.size() - cenOff
    out.write(le32(0x06054b50L))
    out.write(le16(0)); out.write(le16(0)); out.write(le16(1)); out.write(le16(1))
    out.write(le32(cenSize)); out.write(le32(cenOff)); out.write(le16(0))
    out.toByteArray
  }

  private def extractText(archive: Array[Byte]): String = {
    import graft.core.{DocRow, Span}
    val d = graft.engine.Extractor.extract(DocRow("alt.zip",
      Seq(Span("bytes", graft.corpus.Corpus.b64(archive), null, 0))))
    d.spans.filter(_.kind == graft.core.Span.KindText).map(_.text).mkString
  }

  test("bzip2 member (method 12) from the real libbz2 encoder") {
    val t = extractText(zipWith("doc.txt", 12, bz2Blob, plain.length, plainCrc))
    assert(t.contains("Alternate zip codec member content"))
  }

  test("lzma member (method 14) from the real liblzma encoder") {
    val t = extractText(zipWith("doc.txt", 14, lzma14Blob, plain.length, plainCrc))
    assert(t.contains("Alternate zip codec member content"))
  }

  test("xz member (method 95) from the real liblzma encoder") {
    val t = extractText(zipWith("doc.txt", 95, xzBlob, plain.length, plainCrc))
    assert(t.contains("Alternate zip codec member content"))
  }

  test("zstd member (method 93) from the independent zstd-jni encoder") {
    val comp = com.github.luben.zstd.Zstd.compress(plain, 7)
    val t = extractText(zipWith("doc.txt", 93, comp, plain.length, plainCrc))
    assert(t.contains("Alternate zip codec member content"))
  }

  test("crc mismatches on alternate codecs drop the member") {
    val bad = zipWith("doc.txt", 12, bz2Blob, plain.length, plainCrc ^ 0xff)
    val t = extractText(bad)
    assert(!t.contains("Alternate zip codec member content"))
  }

  test("corrupt payloads fail cleanly for every method id") {
    val rnd = new java.util.Random(3)
    for (m <- Seq(12, 14, 93, 95); _ <- 0 until 30) {
      val src = m match {
        case 12 => bz2Blob.clone()
        case 14 => lzma14Blob.clone()
        case 95 => xzBlob.clone()
        case _ => com.github.luben.zstd.Zstd.compress(plain, 3)
      }
      src(rnd.nextInt(src.length)) = rnd.nextInt(256).toByte
      extractText(zipWith("doc.txt", m, src, plain.length, plainCrc))
    }
  }
}
