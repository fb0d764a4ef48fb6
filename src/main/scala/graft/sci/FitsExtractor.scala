package graft.sci

import java.nio.charset.StandardCharsets

import graft.engine.{MetaSink, SpanSink}

/** FITS (Flexible Image Transport System) primary-header extraction.
  *
  * Reference behavior: tika-parser-scientific-module's GDALParser shells
  * out to `gdalinfo`, whose FITS driver reports each primary-HDU header
  * keyword as metadata with cfitsio's value rendering — numeric values
  * keep their RAW card text (`-7.319537E1`, not `-73.19537`), quoted
  * strings keep interior spaces including an all-blank value
  * (TestGDALParser.testParseFITS pins `CAL_VER` = 24 spaces), and the
  * structural keywords (SIMPLE, BITPIX, NAXISn, EXTEND) plus
  * COMMENT/HISTORY narrative cards are not metadata. Here the public
  * FITS 4.0 card grammar (80-byte card images, 2880-byte blocks, END
  * terminator, `''` quote escaping) is read directly — no external
  * binary.
  */
object FitsExtractor {

  final class FitsMalformed(msg: String) extends Exception(msg)

  private val Structural = Set("SIMPLE", "BITPIX", "EXTEND", "END",
    "COMMENT", "HISTORY", "CONTINUE", "")

  def extract(bytes: Array[Byte], sink: SpanSink, meta: MetaSink): Unit = {
    if (bytes.length < 80 ||
        !new String(bytes, 0, 9, StandardCharsets.US_ASCII).startsWith("SIMPLE  ="))
      throw new FitsMalformed("missing SIMPLE card")
    var naxis = Vector.empty[Long]
    var bitpix = 0
    var cards = 0
    var i = 0
    var done = false
    val maxCards = 10000
    while (!done && i + 80 <= bytes.length && cards < maxCards) {
      val card = new String(bytes, i, 80, StandardCharsets.US_ASCII)
      i += 80
      cards += 1
      val key = card.substring(0, 8).trim
      if (key == "END") done = true
      else if (card.length >= 10 && card.charAt(8) == '=') {
        val body = card.substring(10)
        val value: String =
          if (body.dropWhile(_ == ' ').startsWith("'")) {
            // quoted string: '' escapes a quote; interior spaces kept
            val s = body.dropWhile(_ == ' ').drop(1)
            val out = new StringBuilder
            var j = 0
            var closed = false
            while (j < s.length && !closed) {
              if (s.charAt(j) == '\'') {
                if (j + 1 < s.length && s.charAt(j + 1) == '\'') {
                  out.append('\''); j += 2
                } else closed = true
              } else { out.append(s.charAt(j)); j += 1 }
            }
            out.toString
          } else {
            // raw token up to the comment slash, as written on the card
            val slash = body.indexOf('/')
            (if (slash >= 0) body.substring(0, slash) else body).trim
          }
        if (key == "BITPIX") bitpix = value.toIntOption.getOrElse(0)
        else if (key.startsWith("NAXIS") && key != "NAXIS")
          naxis :+= value.toLongOption.getOrElse(0L)
        if (!Structural.contains(key) && !(key.startsWith("NAXIS") &&
            key.drop(5).forall(_.isDigit)))
          meta.add(key, value)
      }
    }
    if (!done) throw new FitsMalformed("no END card in primary header")
    if (naxis.nonEmpty) {
      meta.set("fits:dimensions", naxis.mkString("x"))
      sink.chars(s"FITS image ${naxis.mkString(" x ")}, BITPIX $bitpix\n")
      sink.newline()
    }
  }
}
