package graft.ole2

import graft.mime.MediaTypes

/** OLE2/CFB container specialization by directory-entry name scan.
  *
  * Reference: tika-parsers microsoft-module POIFSContainerDetector walks
  * the compound-file directory and maps well-known entry names to the
  * concrete Office type. Directory entry names are stored as UTF-16LE
  * strings inside 128-byte directory records (MS-CFB §2.6); we locate
  * them with a bounded byte scan rather than a full FAT walk — the
  * names are unique enough that a match identifies the subtype, and v1
  * does not parse the streams (text extraction of legacy binary Office
  * formats stays unsupported, recorded in the status column).
  */
object Ole2Detector {

  private def utf16le(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)

  private val Markers: Seq[(Array[Byte], String)] = Seq(
    utf16le("WordDocument") -> MediaTypes.MsWord,
    utf16le("Workbook") -> MediaTypes.MsExcel,
    utf16le("Book") -> MediaTypes.MsExcel,
    utf16le("PowerPoint Document") -> MediaTypes.MsPowerPoint,
    utf16le("__properties_version1.0") -> MediaTypes.MsOutlook
  )

  val ScanWindow: Int = 1 << 20 // directory sectors sit early in practice

  def specialize(bytes: Array[Byte]): String = {
    val n = math.min(bytes.length, ScanWindow)
    Markers.collectFirst {
      case (marker, mime) if indexOf(bytes, n, marker) >= 0 => mime
    }.getOrElse(MediaTypes.TikaMsOffice)
  }

  private def indexOf(hay: Array[Byte], n: Int, needle: Array[Byte]): Int = {
    val m = needle.length
    var i = 0
    while (i + m <= n) {
      var j = 0
      var ok = true
      while (ok && j < m) {
        if (hay(i + j) != needle(j)) ok = false
        j += 1
      }
      if (ok) return i
      i += 1
    }
    -1
  }
}
