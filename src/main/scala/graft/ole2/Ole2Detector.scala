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

  private val NameMarkers: Seq[(String, String)] = Seq(
    (0x05.toChar + "HwpSummaryInformation") -> graft.mime.MimeDb.HwpV5,
    "NativeContent_MAIN" -> graft.mime.MimeDb.Qpw,
    "Dgn~H" -> "image/vnd.dgn;version=8",
    "EncryptedPackage" -> OoxmlProtected,
    "__properties_version1.0" -> MediaTypes.MsOutlook,
    "VisioDocument" -> "application/vnd.visio",
    "Quill" -> "application/x-mspublisher",
    "SwDocContentMgr" -> "application/sldworks",
    // Works 7.0 spreadsheets contain BOTH WksSSWorkBook and Workbook —
    // this entry must outrank the Excel markers
    // (POIFSContainerDetector.java:311-316)
    "WksSSWorkBook" -> "application/x-tika-msworks-spreadsheet",
    "MatOST" -> "application/vnd.ms-works",
    "PowerPoint Document" -> MediaTypes.MsPowerPoint,
    "WordDocument" -> MediaTypes.MsWord,
    "Workbook" -> MediaTypes.MsExcel,
    "Book" -> MediaTypes.MsExcel,
    // after the main Office markers: an equation object's own CFB has
    // only this stream at root, but a damaged Word file scanned by the
    // fallback must still prefer WordDocument
    "Equation Native" -> "application/vnd.ms-equation"
  )

  private val Markers: Seq[(Array[Byte], String)] =
    NameMarkers.map { case (n, t) => utf16le(n) -> t }

  val ScanWindow: Int = 1 << 20 // directory sectors sit early in practice

  def specialize(bytes: Array[Byte]): String = {
    // Primary path matches the reference's POIFSContainerDetector: only
    // ROOT-level directory entry names identify the container type, so a
    // Word .doc carrying an embedded HWP/QuattroPro OLE object in a
    // sub-storage still detects as Word, not as the embedded type.
    // Entry names compare case-blind (MS-CFB §2.6.4).
    val byRoot: Option[String] =
      try {
        val rootNames = Cfb.parse(bytes).entries.iterator
          .filter(e => e.path.isEmpty && e.objType != 5)
          .map(_.name.toUpperCase(java.util.Locale.ROOT)).toSet
        NameMarkers.collectFirst {
          case (name, mime) if rootNames(name.toUpperCase(java.util.Locale.ROOT)) => mime
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    byRoot.getOrElse {
      // Malformed/truncated CFB, or a parse that surfaced no known root
      // name: fall back to the aligned byte scan so damaged-but-
      // recognizable files still get a best-effort subtype.
      val n = math.min(bytes.length, ScanWindow)
      Markers.collectFirst {
        case (marker, mime) if matchesAligned(bytes, n, marker) => mime
      }.getOrElse(MediaTypes.TikaMsOffice)
    }
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
