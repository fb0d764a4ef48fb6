package graft.corpus

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import scala.util.Random
import graft.ole2.CfbWriter

/** Synthetic binary-Office rows for the corpus `msbin` kind (v19):
  * XLSB binary workbooks, Publisher Quill containers, and uncompressed
  * HDGF Visio documents — each deterministic in the row rng, exercising
  * XlsbExtractor / PubExtractor / VsdExtractor through the pipeline.
  */
object MsBinCorpus {

  // ---- XLSB ---------------------------------------------------------

  private def rec(out: ByteArrayOutputStream, id: Int,
      body: Array[Byte]): Unit = {
    if (id < 0x80) out.write(id)
    else { out.write((id & 0x7f) | 0x80); out.write((id >> 7) & 0x7f) }
    var len = body.length
    var more = true
    while (more) {
      val b = len & 0x7f
      len >>>= 7
      more = len > 0
      out.write(if (more) b | 0x80 else b)
    }
    out.write(body)
  }

  private def wide(s: String): Array[Byte] = {
    val chars = s.getBytes(StandardCharsets.UTF_16LE)
    val out = new Array[Byte](4 + chars.length)
    val n = s.length
    out(0) = n.toByte; out(1) = (n >> 8).toByte
    out(2) = (n >> 16).toByte; out(3) = (n >> 24).toByte
    System.arraycopy(chars, 0, out, 4, chars.length)
    out
  }

  private def u32(v: Long): Array[Byte] =
    Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)

  def xlsbFile(r: Random): Array[Byte] = {
    val shared = (0 until 3 + r.nextInt(3))
      .map(_ => Corpus.Words(r.nextInt(Corpus.Words.length)))

    val wb = new ByteArrayOutputStream()
    rec(wb, 131, Array.emptyByteArray) // BrtBeginBook
    rec(wb, 156, u32(0) ++ u32(1) ++ wide("rId1") ++ wide("Sheet1"))
    rec(wb, 132, Array.emptyByteArray) // BrtEndBook

    val sst = new ByteArrayOutputStream()
    rec(sst, 159, u32(shared.length) ++ u32(shared.length))
    shared.foreach(s => rec(sst, 19, Array(0.toByte) ++ wide(s)))
    rec(sst, 160, Array.emptyByteArray)

    val sh = new ByteArrayOutputStream()
    rec(sh, 129, Array.emptyByteArray) // BrtBeginSheet
    rec(sh, 145, Array.emptyByteArray) // BrtBeginSheetData
    val nRows = 2 + r.nextInt(3)
    (0 until nRows).foreach { ri =>
      rec(sh, 0, u32(ri)) // BrtRowHdr
      // A: shared string, B: RK int, C: inline string
      rec(sh, 7, u32(0) ++ u32(0) ++ u32(r.nextInt(shared.length)))
      rec(sh, 2, u32(1) ++ u32(0) ++ u32((r.nextInt(100000).toLong << 2) | 2L))
      rec(sh, 6, u32(2) ++ u32(0) ++
        wide(Corpus.Words(r.nextInt(Corpus.Words.length))))
    }
    rec(sh, 146, Array.emptyByteArray) // BrtEndSheetData
    rec(sh, 130, Array.emptyByteArray) // BrtEndSheet

    val rels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.bin"/>""" +
      """</Relationships>"""
    val cts =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
      """<Default Extension="bin" ContentType="application/vnd.ms-excel.sheet.binary.macroEnabled.main"/>""" +
      """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
      """</Types>"""
    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.bin"/>""" +
      """</Relationships>"""
    Corpus.zip(Seq(
      "[Content_Types].xml" -> cts.getBytes(StandardCharsets.UTF_8),
      "_rels/.rels" -> rootRels.getBytes(StandardCharsets.UTF_8),
      "xl/workbook.bin" -> wb.toByteArray,
      "xl/_rels/workbook.bin.rels" -> rels.getBytes(StandardCharsets.UTF_8),
      "xl/sharedStrings.bin" -> sst.toByteArray,
      "xl/worksheets/sheet1.bin" -> sh.toByteArray))
  }

  // ---- Publisher ------------------------------------------------------

  def pubFile(r: Random): Array[Byte] = {
    val story = (0 until 2 + r.nextInt(2))
      .map(_ => Corpus.paragraph(r, 2)).mkString("\r") + "\r"
    val text = story.getBytes(StandardCharsets.UTF_16LE)
    val from = 0x220
    val contents = new Array[Byte](from + text.length)
    "CHNKINK ".getBytes(StandardCharsets.US_ASCII)
      .copyToArray(contents, 0)
    // one TEXT bit descriptor at 0x20
    contents(0x20) = 0x18; contents(0x21) = 0x00
    "TEXT".getBytes(StandardCharsets.US_ASCII).copyToArray(contents, 0x22)
    "TEXT".getBytes(StandardCharsets.US_ASCII).copyToArray(contents, 0x2c)
    u32(from).copyToArray(contents, 0x30)
    u32(text.length).copyToArray(contents, 0x34)
    text.copyToArray(contents, from)
    CfbWriter.write(Seq(
      "Quill" -> Array[Byte](0),
      "CONTENTS" -> contents))
  }

  // ---- Visio (uncompressed HDGF) ---------------------------------------

  def vsdFile(r: Random): Array[Byte] = {
    val texts = (0 until 1 + r.nextInt(2)).map(_ => Corpus.paragraph(r, 2))
    val chunks = new ByteArrayOutputStream()
    texts.zipWithIndex.foreach { case (t, i) =>
      val payload = (t + "\n").getBytes(StandardCharsets.UTF_16LE)
      chunks.write(u32(0x0e)) // Text chunk
      chunks.write(u32(i + 1))
      chunks.write(u32(0))
      chunks.write(u32(8 + payload.length))
      chunks.write(Array(2.toByte, 0.toByte, 0x50.toByte)) // level, flag
      chunks.write(new Array[Byte](8))
      chunks.write(payload)
    }
    val chunkBytes = chunks.toByteArray

    val header = 0x40
    val trailerLen = 16 + 18
    val chunkOff = header + trailerLen
    val vd = new ByteArrayOutputStream()
    val head = new Array[Byte](header)
    "Visio (TM) Drawing\r\n".getBytes(StandardCharsets.US_ASCII)
      .copyToArray(head, 0)
    head(0x1a) = 11 // version
    // trailer pointer @0x24: type, address, offset, length, format
    u32(20).copyToArray(head, 0x24)
    u32(0).copyToArray(head, 0x28)
    u32(header).copyToArray(head, 0x2c)
    u32(trailerLen).copyToArray(head, 0x30)
    head(0x34) = 0x50; head(0x35) = 0 // uncompressed pointer stream
    vd.write(head)
    // trailer stream: u32 ptrOff=8, pad, count=1, unknown, one pointer
    vd.write(u32(8)); vd.write(u32(0))
    vd.write(u32(1)); vd.write(u32(0))
    vd.write(u32(0x15)); vd.write(u32(0)) // pointer: type, address
    vd.write(u32(chunkOff)); vd.write(u32(chunkBytes.length))
    vd.write(Array(0xd0.toByte, 0.toByte)) // chunk stream, uncompressed
    vd.write(chunkBytes)
    CfbWriter.write(Seq("VisioDocument" -> vd.toByteArray))
  }
}
