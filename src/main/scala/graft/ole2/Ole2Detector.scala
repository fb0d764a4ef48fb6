package graft.ole2

import graft.mime.MediaTypes

/** OLE2/CFB container specialization by directory-entry name scan.
  *
  * Reference: tika-parsers microsoft-module POIFSContainerDetector walks
  * the compound-file directory and maps well-known entry names to the
  * concrete Office type. Directory entry names are stored as UTF-16LE
  * strings inside 128-byte directory records (MS-CFB §2.6); we locate
  * them with a bounded byte scan rather than a full FAT walk — the
  * names are unique enough that a match identifies the subtype before
  * the bytes reach the [[Cfb]]-based stream extractors (DocExtractor /
  * XlsExtractor / PptExtractor / MsgExtractor).
  */
object Ole2Detector {

  private def utf16le(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)

  /** Most-specific first: outlook's property stream and the PowerPoint
    * entry before the short generic names, so UTF-16 stream TEXT that
    * happens to contain "Book" cannot shadow the real container type.
    */
  /** Password-protected OOXML: the CFB wrapper holding the AES-encrypted
    * zip (POIFSContainerDetector.OOXML_PROTECTED). */
  val OoxmlProtected = "application/x-tika-ooxml-protected"

  private val Markers: Seq[(Array[Byte], String)] = Seq(
    utf16le(0x05.toChar + "HwpSummaryInformation") -> graft.mime.MimeDb.HwpV5,
    utf16le("NativeContent_MAIN") -> graft.mime.MimeDb.Qpw,
    utf16le("Dgn~H") -> "image/vnd.dgn;version=8",
    utf16le("EncryptedPackage") -> OoxmlProtected,
    utf16le("__properties_version1.0") -> MediaTypes.MsOutlook,
    utf16le("PowerPoint Document") -> MediaTypes.MsPowerPoint,
    utf16le("WordDocument") -> MediaTypes.MsWord,
    utf16le("Workbook") -> MediaTypes.MsExcel,
    utf16le("WORKBOOK") -> MediaTypes.MsExcel, // names compare case-blind
    utf16le("Book") -> MediaTypes.MsExcel
  )

  val ScanWindow: Int = 1 << 20 // directory sectors sit early in practice

  def specialize(bytes: Array[Byte]): String = {
    val n = math.min(bytes.length, ScanWindow)
    Markers.collectFirst {
      case (marker, mime) if matchesAligned(bytes, n, marker) => mime
    }.getOrElse(MediaTypes.TikaMsOffice)
  }

  /** Directory-entry name fields sit at 128-byte-aligned offsets (MS-CFB
    * §2.6: 128-byte records in 512-byte-aligned sectors), so only aligned
    * positions are tested — stream payload text at odd offsets no longer
    * matches.
    */
  private def matchesAligned(hay: Array[Byte], n: Int, needle: Array[Byte]): Boolean = {
    val m = needle.length
    var i = 0
    while (i + m <= n) {
      var j = 0
      var ok = true
      while (ok && j < m) {
        if (hay(i + j) != needle(j)) ok = false
        j += 1
      }
      if (ok) return true
      i += 128
    }
    false
  }
}
