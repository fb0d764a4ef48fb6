package graft.ole2

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.{Charset, StandardCharsets}

/** Minimal MS-OLEPS property-set reader — the `\u0005SummaryInformation`
  * / `\u0005HwpSummaryInformation` streams Office-family containers use
  * for title/author/dates metadata.
  *
  * Reference behavior: tika-parsers microsoft SummaryExtractor and
  * hwp/HwpTextExtractorV5.java:populateMatadata (PIDSI ids 2..14 via
  * POI's PropertySet). Layout per the public MS-OLEPS spec: header
  * (byte order, version, system id, CLSID, set count), per-set FMTID +
  * offset, then a section of (id, offset) pairs with typed values.
  */
object OleProps {

  private val VT_I2 = 2
  private val VT_I4 = 3
  private val VT_BOOL = 11
  private val VT_LPSTR = 30
  private val VT_LPWSTR = 31
  private val VT_FILETIME = 64

  /** Parse the FIRST property set's properties: id → value (String,
    * Int, Boolean, or java.time.Instant). Malformed input → empty map.
    */
  def parse(bytes: Array[Byte]): Map[Int, Any] = {
    try {
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      if (bytes.length < 48 || (buf.getShort(0) & 0xffff) != 0xfffe) return Map.empty
      val numSets = buf.getInt(24)
      if (numSets < 1) return Map.empty
      val secOff = buf.getInt(44)
      if (secOff < 0 || secOff + 8 > bytes.length) return Map.empty
      val numProps = buf.getInt(secOff + 4)
      if (numProps < 0 || numProps > 1000) return Map.empty

      // codepage (pid 1) first: it governs VT_LPSTR decoding
      var codepage: Charset = Charset.forName("windows-1252")
      val pairs = (0 until numProps).map { i =>
        (buf.getInt(secOff + 8 + i * 8), buf.getInt(secOff + 12 + i * 8))
      }
      pairs.find(_._1 == 1).foreach { case (_, off) =>
        val p = secOff + off
        if (p + 8 <= bytes.length && buf.getInt(p) == VT_I2) {
          val cp = buf.getShort(p + 4) & 0xffff
          try codepage = Charset.forName(
            if (cp == 1200) "UTF-16LE" else if (cp == 65001) "UTF-8" else s"cp$cp")
          catch { case _: Exception => () }
        }
      }

      pairs.flatMap { case (id, off) =>
        val p = secOff + off
        if (p < 0 || p + 8 > bytes.length) None
        else buf.getInt(p) match {
          case VT_I2 => Some(id -> (buf.getShort(p + 4).toInt))
          case VT_I4 => Some(id -> buf.getInt(p + 4))
          case VT_BOOL => Some(id -> (buf.getShort(p + 4) != 0))
          case VT_LPSTR =>
            val n = buf.getInt(p + 4)
            if (n < 0 || p + 8 + n > bytes.length) None
            else {
              val s = new String(bytes, p + 8, n, codepage)
              Some(id -> s.takeWhile(_ != '\u0000'))
            }
          case VT_LPWSTR =>
            val n = buf.getInt(p + 4) // char count incl. NUL
            if (n < 0 || p + 8 + n * 2 > bytes.length) None
            else {
              val s = new String(bytes, p + 8, n * 2, StandardCharsets.UTF_16LE)
              Some(id -> s.takeWhile(_ != '\u0000'))
            }
          case VT_FILETIME =>
            val ft = buf.getLong(p + 4)
            if (ft <= 0) None
            else Some(id -> java.time.Instant.ofEpochMilli(
              ft / 10000L - 11644473600000L))
          case _ => None
        }
      }.toMap
    } catch { case _: Exception => Map.empty }
  }

  /** Surface the container's `\u0005SummaryInformation` stream (if any)
    * as metadata — skips DocumentSummaryInformation, whose ids differ.
    */
  def fromCfb(cfb: Cfb.Doc, meta: graft.engine.MetaSink): Unit =
    cfb.streams.find(e => e.name.endsWith("SummaryInformation") &&
        !e.name.contains("DocumentSummary"))
      .foreach(e => try summaryMeta(cfb.readStream(e), meta)
        catch { case _: Exception => () })

  /** PIDSI-standard summary ids → graft metadata keys (the same fields
    * the reference's SummaryExtractor / HWP populateMatadata surface).
    */
  def summaryMeta(propStream: Array[Byte], meta: graft.engine.MetaSink): Unit = {
    val props = parse(propStream)
    def str(id: Int): Option[String] =
      props.get(id).collect { case s: String if s.nonEmpty => s }
    str(2).foreach(meta.set("dc:title", _))
    str(3).foreach(meta.set("dc:subject", _))
    str(4).foreach(meta.set("dc:creator", _))
    str(5).foreach(meta.set("meta:keyword", _))
    str(6).foreach(meta.set("dc:description", _))
    str(8).foreach(meta.set("meta:last-author", _))
    props.get(12).collect { case t: java.time.Instant =>
      meta.set("dcterms:created", t.toString) }
    props.get(13).collect { case t: java.time.Instant =>
      meta.set("dcterms:modified", t.toString) }
    props.get(14).collect { case n: Int if n > 0 =>
      meta.set("meta:page-count", n.toString) }
    str(18).foreach(meta.set("extended-properties:Application", _))
  }
}
