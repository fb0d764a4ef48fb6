package graft.corpus

import java.nio.charset.StandardCharsets
import scala.util.Random

/** Synthetic fixed-layout / graphics documents for the corpus "fixed"
  * kind (v18): XPS packages, EMF and WMF metafiles carrying text
  * records. Deterministic per-row (seeded Random), exercising the r4d
  * extractors end-to-end in the corpus pipeline.
  */
object FixedCorpus {

  private def xml(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Minimal conformant XPS: fixedrepresentation rels → fdseq → fdoc →
    * one fpage with one Glyphs run per sentence (distinct OriginY rows).
    */
  def xps(r: Random): Array[Byte] = {
    val lines = (1 to 2 + r.nextInt(3)).map(_ => Corpus.sentence(r, 4 + r.nextInt(8)))
    val glyphs = lines.zipWithIndex.map { case (s, i) =>
      s"""  <Glyphs OriginX="48" OriginY="${96 + i * 24}" FontUri="/f.odttf"""" +
      s""" FontRenderingEmSize="12" UnicodeString="${xml(s)}" />"""
    }.mkString("\n")
    val fpage =
      s"""<FixedPage xmlns="http://schemas.microsoft.com/xps/2005/06" Width="816" Height="1056" xml:lang="en-US">
$glyphs
</FixedPage>"""
    val title = Corpus.sentence(r, 3)
    Corpus.zip(Seq(
      "[Content_Types].xml" ->
        ("""<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
         """<Default Extension="fdseq" ContentType="application/vnd.ms-package.xps-fixeddocumentsequence+xml"/>""" +
         """<Default Extension="fdoc" ContentType="application/vnd.ms-package.xps-fixeddocument+xml"/>""" +
         """<Default Extension="fpage" ContentType="application/vnd.ms-package.xps-fixedpage+xml"/>""" +
         """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
         """<Default Extension="xml" ContentType="application/xml"/></Types>""").getBytes(StandardCharsets.UTF_8),
      "_rels/.rels" ->
        ("""<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
         """<Relationship Id="R0" Type="http://schemas.microsoft.com/xps/2005/06/fixedrepresentation" Target="/FixedDocSeq.fdseq"/>""" +
         """</Relationships>""").getBytes(StandardCharsets.UTF_8),
      "FixedDocSeq.fdseq" ->
        ("""<FixedDocumentSequence xmlns="http://schemas.microsoft.com/xps/2005/06">""" +
         """<DocumentReference Source="/Documents/1/FixedDoc.fdoc"/></FixedDocumentSequence>""").getBytes(StandardCharsets.UTF_8),
      "Documents/1/FixedDoc.fdoc" ->
        ("""<FixedDocument xmlns="http://schemas.microsoft.com/xps/2005/06">""" +
         """<PageContent Source="Pages/1.fpage"/></FixedDocument>""").getBytes(StandardCharsets.UTF_8),
      "Documents/1/Pages/1.fpage" -> fpage.getBytes(StandardCharsets.UTF_8),
      "docProps/core.xml" ->
        (s"""<?xml version="1.0"?><coreProperties xmlns="http://schemas.openxmlformats.org/package/2006/metadata/core-properties" xmlns:dc="http://purl.org/dc/elements/1.1/">""" +
         s"""<dc:title>${xml(title)}</dc:title><dc:creator>corpus</dc:creator>""" +
         s"""</coreProperties>""").getBytes(StandardCharsets.UTF_8)))
  }

  private def le16(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >>> 8) & 0xff)
  }
  private def le32(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    le16(o, v & 0xffff); le16(o, v >>> 16)
  }

  /** Minimal EMF: 88-byte EMR_HEADER (" EMF" signature at 40), one
    * EMR_EXTTEXTOUTW per sentence at distinct y rows, EMR_EOF.
    */
  def emf(r: Random): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    // EMR_HEADER
    le32(o, 1); le32(o, 88)
    (0 until 8).foreach(_ => le32(o, 0)) // bounds + frame rects
    le32(o, 0x464D4520)                  // " EMF" signature
    le32(o, 0x00010000)                  // version
    le32(o, 0)                           // nBytes (unused by readers here)
    le32(o, 0)                           // nRecords
    le16(o, 0); le16(o, 0)               // nHandles, reserved
    le32(o, 0); le32(o, 0)               // description length/offset
    le32(o, 0)                           // nPalEntries
    le32(o, 816); le32(o, 1056)          // device
    le32(o, 210); le32(o, 297)           // millimeters
    val lines = (1 to 2 + r.nextInt(3)).map(_ => Corpus.sentence(r, 4 + r.nextInt(8)))
    lines.zipWithIndex.foreach { case (s, i) =>
      val chars = s.toCharArray
      val strBytes = chars.length * 2
      val pad = (4 - (strBytes & 3)) & 3
      val size = 76 + strBytes + pad
      val y = 100 + i * 20
      le32(o, 84); le32(o, size)                 // EMR_EXTTEXTOUTW
      le32(o, 48); le32(o, y)                    // bounds l,t
      le32(o, 48 + 7 * chars.length); le32(o, y + 14) // bounds r,b
      le32(o, 1)                                 // GM_COMPATIBLE
      le32(o, 0); le32(o, 0)                     // ex/ey scale
      le32(o, 48); le32(o, y)                    // reference point
      le32(o, chars.length)                      // nChars
      le32(o, 76)                                // offString
      le32(o, 0)                                 // options
      (0 until 4).foreach(_ => le32(o, 0))       // rect
      le32(o, 0)                                 // offDx (no dx array)
      chars.foreach(c => le16(o, c.toInt))
      (0 until pad).foreach(_ => o.write(0))
    }
    le32(o, 14); le32(o, 20); le32(o, 0); le32(o, 0); le32(o, 20) // EMR_EOF
    o.toByteArray
  }

  /** Minimal WMF: standard META_HEADER, META_CREATEFONTINDIRECT, one
    * META_EXTTEXTOUT paragraph per sentence, META_EOF.
    */
  def wmf(r: Random): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    le16(o, 1); le16(o, 9); le16(o, 0x0300)  // disk metafile, 9 words, v3
    le32(o, 0)                               // file size in words (lax)
    le16(o, 0)                               // numObjects
    le32(o, 0)                               // maxRecord
    le16(o, 0)                               // noParameters
    // createFontIndirect: LOGFONT with ANSI charset + 32-byte facename
    val logfont = 18 + 32
    le32(o, (6 + logfont) / 2); le16(o, 0x02fb)
    le16(o, 12); le16(o, 0)                  // height, width
    le16(o, 0); le16(o, 0)                   // escapement, orientation
    le16(o, 400)                             // weight
    o.write(0); o.write(0); o.write(0)       // italic, underline, strikeout
    o.write(0)                               // charSet = ANSI
    o.write(0); o.write(0); o.write(0); o.write(0) // precisions, quality, pitch
    "Corpus".getBytes(StandardCharsets.US_ASCII).foreach(b => o.write(b.toInt))
    (0 until 32 - 6).foreach(_ => o.write(0))
    val lines = (1 to 2 + r.nextInt(3)).map(_ => Corpus.sentence(r, 4 + r.nextInt(8)))
    lines.zipWithIndex.foreach { case (s, i) =>
      val bytes = s.getBytes(StandardCharsets.ISO_8859_1)
      val pad = bytes.length & 1
      le32(o, (6 + 8 + bytes.length + pad) / 2); le16(o, 0x0a32)
      le16(o, 100 + i * 20); le16(o, 48)     // y, x
      le16(o, bytes.length); le16(o, 0)      // count, options
      bytes.foreach(b => o.write(b.toInt))
      if (pad == 1) o.write(0)
    }
    le32(o, 3); le16(o, 0x0000)              // META_EOF
    o.toByteArray
  }
}
