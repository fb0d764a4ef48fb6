package graft.textparse

/** AppleSingle (RFC 1740) wrapper: magic 0x00051600, version, 16 filler
  * bytes, u16 entry count, then (id, offset, length) u32BE descriptors.
  * The data fork (id 1) is the wrapped document; the real-name entry
  * (id 3) carries the original filename.
  *
  * Reference behavior: tika-parsers
  * .../apple/AppleSingleFileParser.java — data fork re-parsed as an
  * embedded document with the real name as resource-name metadata.
  */
object AppleSingle {

  final class AppleSingleMalformed(msg: String) extends Exception(msg)

  val Mime = "application/applefile"

  def isAppleSingle(b: Array[Byte]): Boolean =
    b.length > 26 && b(0) == 0 && b(1) == 5 && (b(2) & 0xff) == 0x16 && b(3) == 0

  /** (originalName, dataFork) */
  def unwrap(b: Array[Byte]): (Option[String], Array[Byte]) = {
    if (!isAppleSingle(b)) throw new AppleSingleMalformed("bad magic")
    def u32(o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    val numEntries = ((b(24) & 0xff) << 8) | (b(25) & 0xff)
    if (numEntries <= 0 || numEntries > 64)
      throw new AppleSingleMalformed(s"bad entry count $numEntries")
    var name: Option[String] = None
    var data: Array[Byte] = null
    var i = 0
    while (i < numEntries) {
      val e = 26 + i * 12
      if (e + 12 > b.length) throw new AppleSingleMalformed("truncated entries")
      val id = u32(e)
      val off = u32(e + 4)
      val len = u32(e + 8)
      if (off >= 0 && len >= 0 && off + len <= b.length) {
        if (id == 1) // data fork
          data = java.util.Arrays.copyOfRange(b, off.toInt, (off + len).toInt)
        else if (id == 3 && len < 4096) // real name
          name = Some(new String(b, off.toInt, len.toInt,
            java.nio.charset.StandardCharsets.US_ASCII))
      }
      i += 1
    }
    if (data == null) throw new AppleSingleMalformed("no data fork")
    (name, data)
  }
}
