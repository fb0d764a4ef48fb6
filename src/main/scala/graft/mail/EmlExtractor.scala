package graft.mail

import java.nio.charset.{Charset, StandardCharsets}
import java.util.Base64
import graft.engine.{MetaSink, SpanSink}

/** RFC 822 / MIME email extraction.
  *
  * Reference: tika-parsers mail-module RFC822Parser (+ attachment
  * recursion; SURVEY.md §2.7). Original implementation on the JDK:
  * header unfolding, Subject/From/To/Date → metadata, text/plain and
  * text/html body parts, multipart boundary walking, base64 /
  * quoted-printable transfer decoding. Attachments surface through the
  * `onAttachment` callback so the engine can recurse like any embedded
  * document.
  */
object EmlExtractor {

  final case class Part(headers: Map[String, String], body: Array[Byte]) {
    def contentType: String =
      headers.getOrElse("content-type", "text/plain").split(";")(0).trim.toLowerCase
    def charset: Charset = {
      val ct = headers.getOrElse("content-type", "")
      val m = java.util.regex.Pattern.compile("(?i)charset=\"?([\\w.:-]+)\"?").matcher(ct)
      if (m.find()) try Charset.forName(m.group(1))
      catch { case _: Exception => StandardCharsets.UTF_8 }
      else StandardCharsets.UTF_8
    }
    def boundary: Option[String] = {
      val ct = headers.getOrElse("content-type", "")
      val m = java.util.regex.Pattern.compile("(?i)boundary=\"?([^\";\\s]+)\"?").matcher(ct)
      if (m.find()) Some(m.group(1)) else None
    }
    def filename: Option[String] = {
      val cd = headers.getOrElse("content-disposition",
        headers.getOrElse("content-type", ""))
      val m = java.util.regex.Pattern.compile("(?i)(?:file)?name=\"?([^\";]+)\"?").matcher(cd)
      if (m.find()) Some(m.group(1).trim) else None
    }
    def isAttachment: Boolean =
      headers.get("content-disposition").exists(_.toLowerCase.startsWith("attachment"))
    def decodedBody: Array[Byte] =
      headers.getOrElse("content-transfer-encoding", "").trim.toLowerCase match {
        case "base64" =>
          try Base64.getMimeDecoder.decode(body) catch { case _: Exception => body }
        case "quoted-printable" => decodeQp(body)
        case _ => body
      }
  }

  /** Split raw message into (headers, body) with header unfolding. */
  def parsePart(raw: Array[Byte]): Part = {
    val text = new String(raw, StandardCharsets.ISO_8859_1)
    val sep = findHeaderEnd(text)
    val headerBlock = text.substring(0, sep._1)
    val headers = scala.collection.mutable.LinkedHashMap[String, String]()
    var currentKey: String = null
    headerBlock.split("\r?\n").foreach { line =>
      if (line.nonEmpty && (line.charAt(0) == ' ' || line.charAt(0) == '\t')) {
        if (currentKey != null) headers(currentKey) = headers(currentKey) + " " + line.trim
      } else {
        val idx = line.indexOf(':')
        if (idx > 0) {
          currentKey = line.substring(0, idx).trim.toLowerCase
          headers(currentKey) = line.substring(idx + 1).trim
        }
      }
    }
    val bodyStr = text.substring(sep._2)
    Part(headers.toMap, bodyStr.getBytes(StandardCharsets.ISO_8859_1))
  }

  private def findHeaderEnd(text: String): (Int, Int) = {
    val rr = text.indexOf("\r\n\r\n")
    val nn = text.indexOf("\n\n")
    if (rr >= 0 && (nn < 0 || rr < nn)) (rr, rr + 4)
    else if (nn >= 0) (nn, nn + 2)
    else (text.length, text.length)
  }

  def splitMultipart(body: Array[Byte], boundary: String): Vector[Array[Byte]] = {
    val text = new String(body, StandardCharsets.ISO_8859_1)
    val delim = "--" + boundary
    val segments = text.split(java.util.regex.Pattern.quote(delim))
    segments.drop(1) // preamble
      .takeWhile(s => !s.startsWith("--"))
      .map(s => s.stripPrefix("\r\n").stripPrefix("\n")
        .getBytes(StandardCharsets.ISO_8859_1))
      .toVector
  }

  private def decodeQp(body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < body.length) {
      val c = body(i)
      if (c == '=') {
        if (i + 2 < body.length && body(i + 1) == '\r' && body(i + 2) == '\n') i += 3
        else if (i + 1 < body.length && body(i + 1) == '\n') i += 2
        else if (i + 2 < body.length) {
          try { out.write(Integer.parseInt(
            new String(body, i + 1, 2, StandardCharsets.ISO_8859_1), 16)); i += 3 }
          catch { case _: NumberFormatException => out.write(c.toInt); i += 1 }
        } else { out.write(c.toInt); i += 1 }
      } else { out.write(c.toInt); i += 1 }
    }
    out.toByteArray
  }

  /** RFC 2047 encoded-word decode for headers (=?utf-8?B?...?=). */
  def decodeHeader(value: String): String = {
    val p = java.util.regex.Pattern.compile("=\\?([^?]+)\\?([BbQq])\\?([^?]*)\\?=")
    val m = p.matcher(value)
    val sb = new StringBuffer
    while (m.find()) {
      val cs = try Charset.forName(m.group(1))
      catch { case _: Exception => StandardCharsets.UTF_8 }
      val decoded = m.group(2).toUpperCase match {
        case "B" =>
          try new String(Base64.getMimeDecoder.decode(m.group(3)), cs)
          catch { case _: Exception => m.group(3) }
        case _ =>
          new String(decodeQp(m.group(3).replace('_', ' ')
            .getBytes(StandardCharsets.ISO_8859_1)), cs)
      }
      m.appendReplacement(sb, java.util.regex.Matcher.quoteReplacement(decoded))
    }
    m.appendTail(sb)
    sb.toString
  }

  /** Split an mbox file into its member messages (reference: mail-module
    * MboxParser). Messages are delimited by postmark lines starting
    * "From " (no colon) at line starts.
    */
  def splitMbox(bytes: Array[Byte]): Vector[Array[Byte]] = {
    val text = new String(bytes, StandardCharsets.ISO_8859_1)
    val out = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    var i = if (text.startsWith("From ")) text.indexOf('\n') + 1 else 0
    while (i > 0 && i < text.length) {
      val next = text.indexOf("\nFrom ", i)
      val end = if (next < 0) text.length else next
      if (end > i) out += text.substring(i, end).getBytes(StandardCharsets.ISO_8859_1)
      i = if (next < 0) -1 else text.indexOf('\n', next + 1) + 1
    }
    // no whole-bytes fallback: a bare postmark with no body yields zero
    // messages (re-feeding the postmark would re-detect as mbox and
    // recurse to the depth cap)
    if (out.isEmpty && bytes.nonEmpty && !text.startsWith("From ")) out += bytes
    out.toVector
  }

  /** Extract a message: headers → metadata, text parts → spans,
    * attachments → `onAttachment(name, bytes)`.
    */
  def extract(bytes: Array[Byte], sink: SpanSink, meta: MetaSink,
      onAttachment: (Option[String], Array[Byte]) => Unit): Unit = {
    val msg = parsePart(bytes)
    msg.headers.get("subject").foreach(s => meta.set("dc:subject", decodeHeader(s)))
    msg.headers.get("from").foreach(s => meta.set("Message:From", decodeHeader(s)))
    msg.headers.get("to").foreach(s => meta.set("Message:To", decodeHeader(s)))
    msg.headers.get("cc").foreach(s => meta.set("Message:Cc", decodeHeader(s)))
    msg.headers.get("bcc").foreach(s => meta.set("Message:Bcc", decodeHeader(s)))
    msg.headers.get("date").foreach(s => meta.set("Message:Date", s))
    // MAPI-originated fields (synthesized by the PST/TNEF walks) keep
    // their provenance namespace, like the reference's MAPI.* properties
    msg.headers.foreach { case (k, v) =>
      if (k.startsWith("x-mapi-"))
        meta.set("mapi:" + k.stripPrefix("x-mapi-"), decodeHeader(v))
    }

    def walk(part: Part, depth: Int): Unit = {
      if (depth > 8) return
      val ct = part.contentType
      if (ct.startsWith("multipart/")) {
        part.boundary.foreach { b =>
          splitMultipart(part.body, b).foreach(seg => walk(parsePart(seg), depth + 1))
        }
      } else if (part.isAttachment || (!ct.startsWith("text/") && ct != "message/rfc822")) {
        onAttachment(part.filename, part.decodedBody)
      } else if (ct == "text/html") {
        graft.html.HtmlExtractor.extract(
          new String(part.decodedBody, part.charset), sink, meta)
      } else { // text/plain and friends
        sink.chars(new String(part.decodedBody, part.charset))
        sink.newline()
      }
    }
    walk(msg, 0)
  }
}
