package graft.warc

import java.nio.charset.StandardCharsets.ISO_8859_1

/** WARC (ISO 28500) web-archive reader — pure JDK, record-framed text
  * format. Reference analog: tika-parser-webarchive-module
  * WARCParser.java:57 (jwarc-backed): `response` records recurse into
  * the embedded-document pipeline with the WARC record headers
  * (`warc:` prefix) and HTTP response head (`warc:http:` prefix,
  * `warc:http:status`) as metadata; `warcinfo` and other record types
  * are skipped (WARCParser.java:120-126). `.warc.gz` arrives through
  * the engine's gzip branch and inner re-detect, like tar.gz.
  */
object WarcExtractor {

  final case class Record(
      warcType: String,
      headers: Vector[(String, String)],
      body: Array[Byte]) {
    def header(name: String): Option[String] =
      headers.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }
    def targetUri: Option[String] = header("WARC-Target-URI")
  }

  /** HTTP response head inside an application/http record body. */
  final case class HttpHead(status: Int, reason: String,
      headers: Vector[(String, String)], payloadOffset: Int) {
    def header(name: String): Option[String] =
      headers.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }
  }

  final class WarcMalformed(msg: String) extends RuntimeException(msg)

  /** One header block: lines to the first blank line; returns (ordered
    * headers, offset past the blank line). Tolerates LF-only endings and
    * RFC-style continuation lines (leading SP/HT).
    */
  private def parseHeaders(b: Array[Byte], start: Int,
      what: String): (Vector[(String, String)], Int) = {
    val out = Vector.newBuilder[(String, String)]
    var pos = start
    var lastKey: String = null
    var lastVal: String = null
    def flush(): Unit = if (lastKey != null) { out += lastKey -> lastVal }
    while (pos < b.length) {
      var eol = pos
      while (eol < b.length && b(eol) != '\n') eol += 1
      val lineEnd = if (eol > pos && b(eol - 1) == '\r') eol - 1 else eol
      if (lineEnd == pos) { // blank line: end of block
        flush()
        return (out.result(), math.min(eol + 1, b.length))
      }
      val line = new String(b, pos, lineEnd - pos, ISO_8859_1)
      if (line.charAt(0) == ' ' || line.charAt(0) == '\t') {
        if (lastKey == null) throw new WarcMalformed(s"$what continuation without header")
        lastVal = lastVal + " " + line.trim
      } else {
        flush()
        val colon = line.indexOf(':')
        if (colon <= 0) throw new WarcMalformed(s"$what header without colon: $line")
        lastKey = line.substring(0, colon).trim
        lastVal = line.substring(colon + 1).trim
      }
      pos = eol + 1
    }
    flush()
    (out.result(), b.length) // EOF ends the block (truncated but usable)
  }

  /** Parse the record stream. Trailing garbage after the last complete
    * record stops the scan; a structurally broken record header throws
    * (the engine records the document-level parse exception).
    */
  def records(bytes: Array[Byte], maxRecords: Int = 10000): Vector[Record] = {
    val out = Vector.newBuilder[Record]
    var pos = 0
    var n = 0
    while (pos < bytes.length && n < maxRecords) {
      // skip inter-record CRLFs
      while (pos < bytes.length && (bytes(pos) == '\r' || bytes(pos) == '\n')) pos += 1
      if (pos >= bytes.length) return out.result()
      // version line
      var eol = pos
      while (eol < bytes.length && bytes(eol) != '\n') eol += 1
      val lineEnd = if (eol > pos && bytes(eol - 1) == '\r') eol - 1 else eol
      val version = new String(bytes, pos, lineEnd - pos, ISO_8859_1)
      if (!version.startsWith("WARC/")) {
        if (n == 0) throw new WarcMalformed(s"not a WARC record: $version")
        return out.result() // trailing garbage after valid records
      }
      val (headers, bodyStart) = parseHeaders(bytes, eol + 1, "WARC")
      val rec = Record("", headers, Array.emptyByteArray)
      val len = rec.header("Content-Length") match {
        case Some(v) =>
          try v.toLong
          catch { case _: NumberFormatException =>
            throw new WarcMalformed(s"bad Content-Length: $v") }
        case None => throw new WarcMalformed("record without Content-Length")
      }
      if (len < 0 || len > Int.MaxValue - 16)
        throw new WarcMalformed(s"Content-Length out of range: $len")
      val bodyEnd = math.min(bodyStart + len, bytes.length.toLong).toInt
      val body = java.util.Arrays.copyOfRange(bytes, bodyStart, bodyEnd)
      out += Record(rec.header("WARC-Type").getOrElse(""), headers, body)
      pos = bodyEnd
      n += 1
    }
    out.result()
  }

  /** Split an application/http;msgtype=response body into head +
    * payload offset. Returns None when the body is not an HTTP
    * response (the caller then treats the whole body as the payload).
    */
  def parseHttpHead(body: Array[Byte]): Option[HttpHead] = {
    if (body.length < 6 ||
        new String(body, 0, 5, ISO_8859_1) != "HTTP/") return None
    var eol = 0
    while (eol < body.length && body(eol) != '\n') eol += 1
    val lineEnd = if (eol > 0 && body(eol - 1) == '\r') eol - 1 else eol
    val statusLine = new String(body, 0, lineEnd, ISO_8859_1)
    val parts = statusLine.split(" ", 3)
    val status =
      if (parts.length >= 2) try parts(1).toInt catch { case _: NumberFormatException => 0 }
      else 0
    val reason = if (parts.length >= 3) parts(2).trim else ""
    val (headers, payloadOffset) = parseHeaders(body, eol + 1, "HTTP")
    Some(HttpHead(status, reason, headers, payloadOffset))
  }

  /** Fixture/corpus writer: well-formed WARC 1.0 with warcinfo +
    * response records (CRLF framing, exact Content-Lengths).
    */
  def write(responses: Seq[(String, String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    val info = "software: graft-corpus\r\nformat: WARC File Format 1.0\r\n"
      .getBytes(ISO_8859_1)
    w("WARC/1.0\r\nWARC-Type: warcinfo\r\n" +
      "WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-000000000000>\r\n" +
      "Content-Type: application/warc-fields\r\n" +
      s"Content-Length: ${info.length}\r\n\r\n")
    out.write(info)
    w("\r\n\r\n")
    responses.zipWithIndex.foreach { case ((uri, contentType, payload), i) =>
      val head = (s"HTTP/1.1 200 OK\r\nContent-Type: $contentType\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n").getBytes(ISO_8859_1)
      w("WARC/1.0\r\nWARC-Type: response\r\n" +
        s"WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-${"%012d".format(i + 1)}>\r\n" +
        s"WARC-Target-URI: $uri\r\n" +
        "Content-Type: application/http;msgtype=response\r\n" +
        s"Content-Length: ${head.length + payload.length}\r\n\r\n")
      out.write(head)
      out.write(payload)
      w("\r\n\r\n")
    }
    out.toByteArray
  }
}
