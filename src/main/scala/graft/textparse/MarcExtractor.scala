package graft.textparse

import graft.engine.{MetaSink, SpanSink}

/** MARC bibliographic records (ISO 2709 / MARC 21) — from scratch per
  * the public Library of Congress format documentation.
  *
  * The reference only glob-detects application/marc (no tika parser),
  * so text extraction goes beyond reference parity. Each record:
  * 24-byte leader (record length [0,5), base address [12,17), leader[9]
  * 'a' = UTF-8), directory of 12-byte entries (tag 3, length 4, offset
  * 5) terminated by 0x1E, then fields — control fields (tag < "010")
  * verbatim, data fields as 2 indicator chars + 0x1F-separated
  * subfields. Title/creator land on dc:* like the reference's other
  * bibliographic paths.
  */
object MarcExtractor {

  def extract(bytes: Array[Byte], sink: SpanSink, meta: MetaSink): Unit = {
    var off = 0
    var records = 0
    while (off + 24 <= bytes.length && records < 10000) {
      val leader = new String(bytes, off, 24, java.nio.charset.StandardCharsets.ISO_8859_1)
      val recLen = digits(leader.substring(0, 5))
      val base = digits(leader.substring(12, 17))
      if (recLen < 24 || off + recLen > bytes.length || base < 24 || base >= recLen)
        return // malformed tail: keep what we have
      val cs =
        if (leader.charAt(9) == 'a') java.nio.charset.StandardCharsets.UTF_8
        else java.nio.charset.StandardCharsets.ISO_8859_1
      if (records == 0) meta.set("marc:leader", leader)
      records += 1
      var d = off + 24
      val dirEnd = off + base - 1
      while (d + 12 <= dirEnd) {
        val tag = new String(bytes, d, 3, java.nio.charset.StandardCharsets.ISO_8859_1)
        val fLen = digits(new String(bytes, d + 3, 4, java.nio.charset.StandardCharsets.ISO_8859_1))
        val fOff = digits(new String(bytes, d + 7, 5, java.nio.charset.StandardCharsets.ISO_8859_1))
        val fs = off + base + fOff
        if (fLen > 0 && fs + fLen <= off + recLen) {
          // strip the field terminator
          val body = new String(bytes, fs, fLen - 1, cs)
          if (tag < "010") {
            sink.chars(s"$tag $body")
            sink.newline()
            if (tag == "001") meta.set("marc:record-id", body)
          } else {
            // data field: indicators then 0x1F-separated subfields
            val subs = body.split('\u001f').toSeq
            val values = subs.drop(1).filter(_.nonEmpty)
            val text = values.map(_.substring(1)).filter(_.nonEmpty)
            if (text.nonEmpty) {
              sink.chars(s"$tag ${text.mkString(" ")}")
              sink.newline()
            }
            def sub(code: Char): Option[String] =
              values.find(_.charAt(0) == code).map(_.substring(1))
            tag match {
              case "245" =>
                val t = (sub('a').toSeq ++ sub('b').toSeq).mkString(" ")
                  .replaceAll("[ /:;,]+$", "")
                if (t.nonEmpty) meta.set("dc:title", t)
              case "100" | "110" | "700" =>
                sub('a').map(_.replaceAll("[ /:;,]+$", ""))
                  .foreach(meta.add("dc:creator", _))
              case "260" | "264" =>
                sub('b').map(_.replaceAll("[ /:;,]+$", ""))
                  .foreach(meta.add("dc:publisher", _))
              case "650" | "653" =>
                sub('a').foreach(meta.add("dc:subject", _))
              case "020" =>
                sub('a').foreach(meta.add("marc:isbn", _))
              case _ => ()
            }
          }
        }
        d += 12
      }
      off += recLen
    }
    meta.set("marc:records", records.toString)
  }

  private def digits(s: String): Int = {
    var v = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c < '0' || c > '9') return -1
      v = v * 10 + (c - '0')
      i += 1
    }
    v
  }
}
