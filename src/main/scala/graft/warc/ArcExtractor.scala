package graft.warc

import java.nio.charset.StandardCharsets

/** ARC (pre-WARC Internet Archive / early Common Crawl) record reader —
  * public format: a `filedesc://` version record followed by records of
  * the form `<url> <ip> <yyyyMMddHHmmss> <mime> <length>\n<payload>\n`
  * (v1; v2 carries five extra fields before the trailing length).
  *
  * Members recurse like WARC responses: the engine strips an HTTP head
  * if present and re-detects the payload. Reference context: the
  * webarchive module's WARC pipeline (warc/WARCParser.java) — its jwarc
  * backend reads .arc the same record-framed way; fixture
  * `test-documents/testARC.arc`.
  */
object ArcExtractor {

  final class ArcMalformed(msg: String) extends RuntimeException(msg)

  final case class Record(url: String, mime: String, date: String,
      body: Array[Byte])

  def isArc(b: Array[Byte]): Boolean =
    b.length > 11 && new String(b, 0, 11, StandardCharsets.US_ASCII) == "filedesc://"

  def records(bytes: Array[Byte], maxRecords: Int = 10000): Vector[Record] = {
    if (!isArc(bytes)) throw new ArcMalformed("not an arc file")
    val out = Vector.newBuilder[Record]
    var pos = 0
    var n = 0
    var first = true
    while (pos < bytes.length && n < maxRecords) {
      // skip inter-record newlines
      while (pos < bytes.length && (bytes(pos) == '\n' || bytes(pos) == '\r'))
        pos += 1
      if (pos < bytes.length) {
        val eol = {
          var i = pos
          while (i < bytes.length && bytes(i) != '\n') i += 1
          i
        }
        if (eol >= bytes.length) throw new ArcMalformed("truncated record header")
        val line = new String(bytes, pos, eol - pos, StandardCharsets.US_ASCII).trim
        val fields = line.split(" ")
        if (fields.length < 5) throw new ArcMalformed("short arc header line")
        val url = fields(0)
        val date = fields(2)
        val mime = fields(3) // v1 layout; v2 still has mime in slot 3
        val len =
          try fields.last.toLong
          catch { case _: NumberFormatException =>
            throw new ArcMalformed("non-numeric arc length") }
        val bodyStart = eol + 1
        if (len < 0 || bodyStart + len > bytes.length)
          throw new ArcMalformed("arc record overruns file")
        if (!first) {
          out += Record(url, mime, date,
            java.util.Arrays.copyOfRange(bytes, bodyStart, (bodyStart + len).toInt))
          n += 1
        }
        first = false // filedesc version record is framing, not content
        pos = (bodyStart + len).toInt
      }
    }
    out.result()
  }
}
