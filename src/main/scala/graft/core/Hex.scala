package graft.core

/** Lowercase hex encoding via a nibble table. The `f"%02x"` string
  * interpolator builds a `java.util.Formatter` (which re-parses the
  * format string) PER BYTE, which made digest hex encoding a measurable
  * share of per-document extraction CPU (~3% of the mixed-corpus
  * profile before the table encoding). Output is byte-identical to
  * `map(b => f"${b & 0xff}%02x").mkString`.
  */
object Hex {
  private val digits = "0123456789abcdef".toCharArray

  def encode(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val v = bytes(i) & 0xff
      out(i * 2) = digits(v >>> 4)
      out(i * 2 + 1) = digits(v & 0xf)
      i += 1
    }
    new String(out)
  }
}
