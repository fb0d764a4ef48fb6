package graft.textparse

import java.nio.charset.StandardCharsets

import graft.engine.{MetaSink, SpanSink}

/** Apple property lists — XML (`<plist>`) and binary (`bplist00`).
  *
  * Reference behavior: tika-parsers .../apple/PListParser.java (which
  * delegates to the dd-plist library) + detect/apple/BPListDetector.java
  * — the object tree renders depth-first with dict keys beside their
  * values; root-dict key sets refine the subtype (memgraph /
  * webarchive / itunes). The binary reader below implements the public
  * bplist00 layout from scratch: marker-nibble objects, BE offset
  * table, 32-byte trailer.
  */
object PlistExtractor {

  final class PlistMalformed(msg: String) extends Exception(msg)

  sealed trait PObj
  final case class PDict(entries: Vector[(String, PObj)]) extends PObj
  final case class PArr(items: Vector[PObj]) extends PObj
  final case class PStr(s: String) extends PObj
  final case class PNum(s: String) extends PObj
  final case class PBool(b: Boolean) extends PObj
  final case class PDate(iso: String) extends PObj
  final case class PData(bytes: Array[Byte]) extends PObj
  final case class PUid(v: Long) extends PObj
  case object PNull extends PObj

  /** Root object of an XML or binary plist (shared with iWork '13). */
  def parseRoot(bytes: Array[Byte]): PObj =
    if (bytes.length >= 8 && new String(bytes, 0, 7, StandardCharsets.US_ASCII) == "bplist0")
      parseBinary(bytes)
    else parseXml(bytes)

  def extract(bytes: Array[Byte], sink: SpanSink, meta: MetaSink,
      child: (Option[String], Array[Byte]) => Unit = (_, _) => ()): Unit = {
    val root = parseRoot(bytes)
    root match {
      case PDict(entries) =>
        val keys = entries.map(_._1).toSet
        val subtype =
          if (keys("nodes") && keys("edges") && keys("graphEncodingVersion"))
            "memgraph"
          else if (keys("WebMainResource")) "webarchive"
          else if (keys("Playlists") && keys("Tracks") && keys("Music Folder"))
            "itunes"
          else ""
        if (subtype.nonEmpty) meta.set("plist:subtype", subtype)
      case _ => ()
    }
    render(root, sink, depth = 0)
    // Safari webarchive payloads: recurse WebResourceData (HTML/JS/CSS
    // bytes) as embedded documents with the resource URL as the name
    // hint — the web-archive analog of the WARC record walk
    webResources(root, 0).foreach { case (url, data) => child(url, data) }
  }

  private def webResources(obj: PObj, depth: Int): Vector[(Option[String], Array[Byte])] = {
    if (depth > 16) return Vector.empty
    obj match {
      case PDict(entries) =>
        val url = entries.collectFirst {
          case ("WebResourceURL", PStr(u)) => u }
        val here = entries.collect {
          case ("WebResourceData", PData(b)) if b.nonEmpty => (url, b) }
        here.toVector ++ entries.flatMap(e => webResources(e._2, depth + 1))
      case PArr(items) => items.flatMap(webResources(_, depth + 1))
      case _ => Vector.empty
    }
  }

  private def render(obj: PObj, sink: SpanSink, depth: Int): Unit = {
    if (depth > 64) return
    obj match {
      case PDict(entries) => entries.foreach { case (k, v) =>
        v match {
          case _: PDict | _: PArr =>
            sink.chars(k); sink.newline()
            render(v, sink, depth + 1)
          case scalar =>
            sink.chars(k + "\t" + scalarText(scalar)); sink.newline()
        }
      }
      case PArr(items) => items.foreach {
        case c @ (_: PDict | _: PArr) => render(c, sink, depth + 1)
        case scalar => sink.chars(scalarText(scalar)); sink.newline()
      }
      case scalar => sink.chars(scalarText(scalar)); sink.newline()
    }
  }

  private def scalarText(o: PObj): String = o match {
    case PStr(s) => s
    case PNum(s) => s
    case PBool(b) => b.toString
    case PDate(s) => s
    case PData(b) => s"<data:${b.length} bytes>"
    case PUid(v) => s"<uid:$v>"
    case PNull => ""
    case _ => ""
  }

  // ---- XML plist ---------------------------------------------------------

  private def parseXml(bytes: Array[Byte]): PObj = {
    val factory = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    factory.setFeature("http://apache.org/xml/features/nonvalidating/load-external-dtd", false)
    factory.setFeature("http://xml.org/sax/features/external-general-entities", false)
    factory.setFeature("http://xml.org/sax/features/external-parameter-entities", false)
    val doc = factory.newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(bytes))
    val rootEl = doc.getDocumentElement
    if (rootEl == null || rootEl.getTagName != "plist")
      throw new PlistMalformed("not a plist document")
    firstElementChild(rootEl).map(fromXml).getOrElse(PNull)
  }

  private def firstElementChild(e: org.w3c.dom.Element): Option[org.w3c.dom.Element] = {
    var n = e.getFirstChild
    while (n != null) {
      n match {
        case el: org.w3c.dom.Element => return Some(el)
        case _ => n = n.getNextSibling
      }
    }
    None
  }
  private def elementChildren(e: org.w3c.dom.Element): Vector[org.w3c.dom.Element] = {
    val out = Vector.newBuilder[org.w3c.dom.Element]
    var n = e.getFirstChild
    while (n != null) {
      n match { case el: org.w3c.dom.Element => out += el; case _ => () }
      n = n.getNextSibling
    }
    out.result()
  }

  private def fromXml(e: org.w3c.dom.Element): PObj = e.getTagName match {
    case "dict" =>
      val kids = elementChildren(e)
      val entries = Vector.newBuilder[(String, PObj)]
      var i = 0
      while (i + 1 < kids.length) {
        if (kids(i).getTagName == "key") {
          entries += (kids(i).getTextContent -> fromXml(kids(i + 1)))
          i += 2
        } else i += 1
      }
      PDict(entries.result())
    case "array" => PArr(elementChildren(e).map(fromXml))
    case "string" => PStr(e.getTextContent)
    case "integer" | "real" => PNum(e.getTextContent.trim)
    case "true" => PBool(true)
    case "false" => PBool(false)
    case "date" => PDate(e.getTextContent.trim)
    case "data" =>
      try PData(java.util.Base64.getMimeDecoder.decode(e.getTextContent.trim))
      catch { case _: IllegalArgumentException => PData(Array.emptyByteArray) }
    case _ => PNull
  }

  // ---- binary plist ------------------------------------------------------

  def parseBinary(b: Array[Byte]): PObj = {
    if (b.length < 40) throw new PlistMalformed("too short")
    def beInt(off: Int, n: Int): Long = {
      // every multi-byte read is range-checked so crafted counts/offsets
      // surface as the typed PlistMalformed, not a raw AIOOBE
      if (off < 0 || n < 0 || n > 16 || off.toLong + n > b.length)
        throw new PlistMalformed("read out of range")
      var v = 0L; var i = 0
      while (i < n) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
      v
    }
    val t = b.length - 32 // trailer
    val offsetIntSize = b(t + 6) & 0xff
    val objectRefSize = b(t + 7) & 0xff
    val numObjects = beInt(t + 8, 8)
    val topObject = beInt(t + 16, 8)
    val offsetTableOffset = beInt(t + 24, 8)
    if (numObjects <= 0 || numObjects > 1000000 || offsetIntSize < 1 ||
        offsetIntSize > 8 || objectRefSize < 1 || objectRefSize > 8 ||
        offsetTableOffset < 8 ||
        offsetTableOffset + numObjects * offsetIntSize > b.length)
      throw new PlistMalformed("bad trailer")
    val offsets = Array.tabulate(numObjects.toInt)(i =>
      beInt((offsetTableOffset + i.toLong * offsetIntSize).toInt, offsetIntSize))

    def readObj(idx: Long, depth: Int): PObj = {
      if (depth > 64 || idx < 0 || idx >= numObjects) return PNull
      var p = offsets(idx.toInt).toInt
      if (p < 8 || p >= b.length) return PNull
      val marker = b(p) & 0xff
      p += 1
      val typ = marker >> 4
      var count = (marker & 0xf).toLong
      def readCount(): Unit = {
        if (count == 0xf) {
          // next object is an int: marker 0x1n, 2^n bytes
          if (p >= b.length) throw new PlistMalformed("count out of range")
          val m2 = b(p) & 0xff
          if ((m2 & 0xf) > 4) throw new PlistMalformed("count too wide")
          val n = 1 << (m2 & 0xf)
          count = beInt(p + 1, n)
          p += 1 + n
        }
      }
      typ match {
        case 0x0 => marker match {
          case 0x08 => PBool(false)
          case 0x09 => PBool(true)
          case _ => PNull
        }
        case 0x1 => // int: 2^exp bytes, exp ≤ 4 (128-bit max per CF)
          if ((marker & 0xf) > 4) throw new PlistMalformed("int too wide")
          val n = 1 << (marker & 0xf)
          PNum(beInt(p, n).toString)
        case 0x2 => // real
          if ((marker & 0xf) > 4) throw new PlistMalformed("real too wide")
          val n = 1 << (marker & 0xf)
          val v =
            if (n == 4) java.lang.Float.intBitsToFloat(beInt(p, 4).toInt).toDouble
            else java.lang.Double.longBitsToDouble(beInt(p, 8))
          PNum(if (v == v.toLong) v.toLong.toString else v.toString)
        case 0x3 => // date: BE double seconds since 2001-01-01
          val secs = java.lang.Double.longBitsToDouble(beInt(p, 8))
          PDate(java.time.Instant.ofEpochMilli(
            978307200000L + (secs * 1000).toLong).toString)
        case 0x4 =>
          readCount()
          val n = math.min(count, 64L * 1024 * 1024).toInt
          PData(java.util.Arrays.copyOfRange(b, p, math.min(b.length, p + n)))
        case 0x5 => // ASCII
          readCount()
          if (count < 0 || p.toLong + count > b.length)
            throw new PlistMalformed("string out of range")
          PStr(new String(b, p, count.toInt, StandardCharsets.US_ASCII))
        case 0x6 => // UTF-16BE
          readCount()
          if (count < 0 || p.toLong + count * 2 > b.length)
            throw new PlistMalformed("string out of range")
          PStr(new String(b, p, count.toInt * 2, StandardCharsets.UTF_16BE))
        case 0x8 => PUid(beInt(p, (marker & 0xf) + 1))
        case 0xa | 0xc => // array / set
          readCount()
          PArr(Vector.tabulate(math.min(count, 100000L).toInt)(i =>
            readObj(beInt(p + i * objectRefSize, objectRefSize), depth + 1)))
        case 0xd => // dict
          readCount()
          val n = math.min(count, 100000L).toInt
          PDict(Vector.tabulate(n) { i =>
            val k = readObj(beInt(p + i * objectRefSize, objectRefSize), depth + 1)
            val v = readObj(
              beInt(p + (n + i) * objectRefSize, objectRefSize), depth + 1)
            (scalarText(k), v)
          })
        case _ => PNull
      }
    }
    readObj(topObject, 0)
  }
}
