package graft.ole2

import graft.engine.MetaSink

/** MSOffice owner/lock temp file (`~$…`): the editor's name, stored as
  * an ASCII length+string at 0 and a UTF-16LE copy at 54 whose length
  * byte must agree.
  *
  * Reference: tika-parser-microsoft-module
  * `microsoft/MSOwnerFileParser.java:61-93` — the unicode copy wins,
  * surfaced as the modifier; a length disagreement is a parse error.
  * Metadata-only, no text output.
  */
object OwnerFileExtractor {

  final class OwnerMalformed(msg: String) extends Exception(msg)

  def extract(bytes: Array[Byte], meta: MetaSink): Unit = {
    if (bytes.length < 56) return
    val n = bytes(0).toInt
    if (n < 0 || n > 54)
      throw new OwnerMalformed("owner-file name length out of range")
    meta.set("dc:modifier",
      new String(bytes, 1, n, java.nio.charset.StandardCharsets.US_ASCII))
    val uLen = bytes(54) & 0xff
    if (uLen == n && 56 + 2 * uLen <= bytes.length)
      meta.set("dc:modifier", new String(bytes, 56, 2 * uLen,
        java.nio.charset.StandardCharsets.UTF_16LE))
    else
      throw new OwnerMalformed("owner-file ascii/unicode length mismatch")
  }
}
