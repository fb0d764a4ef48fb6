package graft.sci

import java.nio.charset.StandardCharsets

import graft.engine.{MetaSink, SpanSink}

/** ENVI image header (.hdr): key = value lines to `envi.*` metadata,
  * every line as body text, multi-line `{...}` values joined, and UTM
  * map-info converted to a WGS-84 lat/lon line.
  *
  * Reference behavior: tika-parsers scientific-module
  * `envi/EnviHeaderParser.java` — continuation lines (start with a
  * space, or contain `{` without the closing `}`) are concatenated with
  * no separator (parseMultiLineFieldValue), keys are dotted
  * (`header offset` -> `envi.header.offset`), lines over 300 chars skip
  * metadata, and a `map info = {UTM, ...}` entry additionally emits
  * `lat/lon = { <lat>, <lon> }` from the standard UTM inverse formula
  * (convertMapInfoValuesToLatLngAndSetMetadata).
  */
object EnviExtractor {

  def extract(bytes: Array[Byte], sink: SpanSink, meta: MetaSink): Unit = {
    val text = new String(bytes, StandardCharsets.UTF_8)
    val pending = new StringBuilder
    var inMulti = false
    for (rawLine <- text.linesIterator) {
      val line = rawLine
      val continues = (line.contains("{") && !line.endsWith("}")) ||
        line.startsWith(" ")
      if (continues || inMulti) {
        pending.append(line)
        inMulti = !line.endsWith("}")
        if (!inMulti) {
          emit(pending.toString, sink, meta)
          pending.clear()
        }
      } else emit(line, sink, meta)
    }
    if (pending.nonEmpty) emit(pending.toString, sink, meta)
  }

  private def emit(line: String, sink: SpanSink, meta: MetaSink): Unit = {
    if (line.length < 300) {
      val kv = line.split("=", 2)
      if (kv.length == 2) {
        val key = kv(0).trim
        if (key == "map info") {
          val values = kv(1).filterNot(c => c == '{' || c == '}' || c == ' ')
            .split(",", -1)
          if (values.nonEmpty && values(0) == "UTM" && values.length > 7) {
            meta.set("envi." + key.replace(" ", "."), kv(1).trim)
            utmToLatLon(values).foreach { case (lat, lon) =>
              meta.set("envi.lat/lon", s"$lat, $lon")
              sink.chars(s"lat/lon = { $lat, $lon }")
              sink.newline()
            }
          } else meta.set("envi." + key.replace(" ", "."), kv(1).trim)
        } else meta.set("envi." + key.replace(" ", "."), kv(1).trim)
      }
    }
    sink.chars(line)
    sink.newline()
  }

  /** UTM -> WGS-84 inverse projection, same constants and series as the
    * reference (WGS-84 ellipsoid, k0 = 0.9996; no southern-hemisphere
    * false-northing correction, matching the reference's behavior).
    */
  private def utmToLatLon(v: Array[String]): Option[(Double, Double)] = {
    try {
      val pixelEasting = v(3).trim.toDouble
      val pixelNorthing = v(4).trim.toDouble
      val zone = if (v(7).trim.nonEmpty) v(7).trim.toInt else 0
      val a = 6378137.0
      val e = 0.0818191910
      val e1sq = 0.006739497
      val k0 = 0.9996
      val arc = pixelNorthing / k0
      val mu = arc / (a * (1.0 - math.pow(e, 2) / 4.0 -
        3.0 * math.pow(e, 4) / 64.0 - 5.0 * math.pow(e, 6) / 256.0))
      val ei = (1.0 - math.sqrt(1.0 - e * e)) / (1.0 + math.sqrt(1.0 - e * e))
      val ca = 3.0 * ei / 2.0 - 27.0 * math.pow(ei, 3) / 32.0
      val cb = 21.0 * math.pow(ei, 2) / 16.0 - 55.0 * math.pow(ei, 4) / 32.0
      val cc = 151.0 * math.pow(ei, 3) / 96.0
      val cd = 1097.0 * math.pow(ei, 4) / 512.0
      val phi1 = mu + ca * math.sin(2.0 * mu) + cb * math.sin(4.0 * mu) +
        cc * math.sin(6.0 * mu) + cd * math.sin(8.0 * mu)
      val n0 = a / math.sqrt(1.0 - math.pow(e * math.sin(phi1), 2))
      val r0 = a * (1.0 - e * e) /
        math.pow(1.0 - math.pow(e * math.sin(phi1), 2), 1.5)
      val fact1 = n0 * math.tan(phi1) / r0
      val a1 = 500000.0 - pixelEasting
      val dd0 = a1 / (n0 * k0)
      val fact2 = dd0 * dd0 / 2.0
      val t0 = math.pow(math.tan(phi1), 2)
      val q0 = e1sq * math.pow(math.cos(phi1), 2)
      val fact3 = (5.0 + 3.0 * t0 + 10.0 * q0 - 4.0 * q0 * q0 - 9.0 * e1sq) *
        math.pow(dd0, 4) / 24.0
      val fact4 = (61.0 + 90.0 * t0 + 298.0 * q0 + 45.0 * t0 * t0 -
        252.0 * e1sq - 3.0 * q0 * q0) * math.pow(dd0, 6) / 720.0
      val lof1 = a1 / (n0 * k0)
      val lof2 = (1.0 + 2.0 * t0 + q0) * math.pow(dd0, 3) / 6.0
      val lof3 = (5.0 - 2.0 * q0 + 28.0 * t0 - 3.0 * math.pow(q0, 2) +
        8.0 * e1sq + 24.0 * math.pow(t0, 2)) * math.pow(dd0, 5) / 120.0
      val a2 = (lof1 - lof2 + lof3) / math.cos(phi1)
      val a3 = a2 * 180.0 / math.Pi
      val zoneCM = if (zone > 0) 6.0 * zone - 183.0 else 3.0
      val latitude = 180.0 * (phi1 - fact1 * (fact2 + fact3 + fact4)) / math.Pi
      val longitude = zoneCM - a3
      Some((latitude, longitude))
    } catch { case _: Exception => None }
  }
}
