package graft.ole2

import graft.mime.MediaTypes

/** OLE2/CFB container specialization by directory-entry name scan.
  *
  * Reference: tika-parsers microsoft-module POIFSContainerDetector walks
  * the compound-file directory and maps well-known entry names to the
  * concrete Office type, and miscoffice-module MiscOLEDetector adds the
  * HWP / QuattroPro / Corel Presentations markers. Directory entry names
  * are stored as UTF-16LE strings inside 128-byte directory records
  * (MS-CFB §2.6); the primary path parses the directory via [[Cfb]], the
  * fallback is a bounded aligned byte scan for damaged files.
  */
object Ole2Detector {

  private def utf16le(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)

  /** Password-protected OOXML: the CFB wrapper holding the AES-encrypted
    * zip (POIFSContainerDetector.OOXML_PROTECTED). */
  val OoxmlProtected = "application/x-tika-ooxml-protected"

  /** OLE2 DRM-encrypted (POIFSContainerDetector.DRM_ENCRYPTED, TIKA-3666). */
  val DrmEncrypted = "application/x-tika-ole-drm-encrypted"

  val MsProject = "application/vnd.ms-project"
  val MsGraphChart = "application/vnd.ms-graph"
  val EsriLayer = "application/x-esri-layer"
  val StarCalc = "application/vnd.stardivision.calc"
  val StarWriter = "application/vnd.stardivision.writer"
  val StarDraw = "application/vnd.stardivision.draw"
  val StarImpress = "application/vnd.stardivision.impress"
  val QuattroWb = "application/x-quattro-pro;version=7-8"
  val CorelShow = "application/x-corelpresentations"
  val CompObjEmbedded = "application/x-tika-msoffice-embedded;format=comp_obj"
  val Ole10Native = "application/x-tika-msoffice-embedded;format=ole10_native"

  /** Ordered fallback markers for the aligned byte scan (damaged CFB).
    * Most-specific first: outlook's property stream and the PowerPoint
    * entry before the short generic names, so UTF-16 stream TEXT that
    * happens to contain "Book" cannot shadow the real container type.
    */
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

  /** MPP "Project Data" stream names look like three spaces + digits
    * (POIFSContainerDetector.mppDataMatch `\s\s\s\d+`). */
  private val MppData = java.util.regex.Pattern.compile("\\s\\s\\s\\d+")

  def specialize(bytes: Array[Byte]): String = {
    // Primary path matches the reference's POIFSContainerDetector: only
    // ROOT-level directory entry names identify the container type, so a
    // Word .doc carrying an embedded HWP/QuattroPro OLE object in a
    // sub-storage still detects as Word, not as the embedded type.
    // Entry names compare case-blind (MS-CFB §2.6.4).
    val byRoot: Option[String] =
      try {
        val doc = Cfb.parse(bytes)
        detectFromDirectory(doc)
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

  /** The POIFSContainerDetector.detect decision tree (reference
    * POIFSContainerDetector.java:275-404) merged with MiscOLEDetector's
    * HWP/Quattro/Corel markers (MiscOLEDetector.java:90-107) — in tika
    * both container detectors run and the non-generic answer wins.
    * Returns None only when the directory walk surfaced no known name,
    * so callers can try the byte-scan fallback before settling on the
    * generic x-tika-msoffice.
    */
  private def detectFromDirectory(doc: Cfb.Doc): Option[String] = {
    val uc = doc.entries.iterator
      .filter(e => e.path.isEmpty && e.objType != 5)
      .map(_.name.toUpperCase(java.util.Locale.ROOT)).toSet
    if (uc.isEmpty) return None
    def anyName(n: String) = // recursive lookup at any depth (findRecursively)
      doc.entries.exists(_.name.equalsIgnoreCase(n))
    def has(n: String) = uc(n.toUpperCase(java.util.Locale.ROOT))
    // CompObj holds an ASCII progid/app name identifying formats that keep
    // all data in that one stream (processCompObjFormatType).
    lazy val compObj: Array[Byte] =
      doc.stream("\u0001CompObj").getOrElse(Array.emptyByteArray)
    def compObjHas(marker: String): Boolean = {
      val m = marker.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val n = compObj.length - m.length
      var i = 0
      while (i <= n) {
        var j = 0
        while (j < m.length && compObj(i + j) == m(j)) j += 1
        if (j == m.length) return true
        i += 1
      }
      false
    }

    // encryption first (checkEncrypted): DRM dataspaces, then protected OOXML
    if (has("\u0006DataSpaces") && anyName("\tDRMDataSpace"))
      return Some(DrmEncrypted)
    if (has("EncryptedPackage")) {
      if (has("EncryptionInfo")) return Some(OoxmlProtected)
      if (has("\u0006DataSpaces") && anyName("DRMEncryptedDataSpace"))
        return Some(DrmEncrypted)
    }

    val t: String =
      if (has("\u0005HwpSummaryInformation")) graft.mime.MimeDb.HwpV5
      else if (has("PerfectOffice_MAIN")) {
        if (has("SlideShow")) CorelShow // Corel Presentations .shw
        else if (has("PerfectOffice_OBJECTS")) QuattroWb // QuattroPro .wb1-3
        else null
      }
      else if (has("NativeContent_MAIN")) graft.mime.MimeDb.Qpw // QPW v9
      else if (has("WksSSWorkBook")) "application/x-tika-msworks-spreadsheet"
      else if (has("Workbook") || has("Book")) {
        // a Workbook whose CompObj declares MSGraph.Chart is an embedded
        // chart object, not a spreadsheet (processCompObjFormatType)
        if (compObjHas("MSGraph.Chart")) MsGraphChart else MediaTypes.MsExcel
      }
      else if (has("SwDocContentMgr") && has("SwDocMgrTempStorage"))
        "application/sldworks"
      else if (has("StarCalcDocument")) StarCalc
      else if (has("StarWriterDocument")) StarWriter
      else if (has("StarDrawDocument3")) {
        // StarDraw and StarImpress share the entry name; CompObj decides
        if (compObjHas("StarDraw")) StarDraw
        else if (compObjHas("StarImpress")) StarImpress
        else null
      }
      else if (has("WordDocument")) MediaTypes.MsWord
      else if (has("Quill")) "application/x-mspublisher"
      else if (has("PowerPoint Document")) MediaTypes.MsPowerPoint
      else if (has("VisioDocument")) "application/vnd.visio"
      else if (has("\u0001Ole10Native")) Ole10Native
      else if (has("MatOST")) "application/vnd.ms-works" // Works WP 3.0/4.0
      else if (has("CONTENTS") && has("SPELLING")) "application/vnd.ms-works"
      else if (has("Equation Native")) "application/vnd.ms-equation"
      else if (has("\u0003OCXNAME")) null // ActiveX control stays generic OLE
      else if (has("CONTENTS") && has("\u0003ObjInfo")) CompObjEmbedded
      else if (has("CONTENTS") && has("\u0001CompObj")) {
        // general OLE2 embedding — unless CompObj marks an old Works file
        if (compObjHas("Quill96")) "application/vnd.ms-works"
        else CompObjEmbedded
      }
      else if (has("CONTENTS")) null // embedded non-office payload
      else if (has("\u0001CompObj") &&
        (has("Props") || has("Props9") || has("Props12"))) {
        // Microsoft Project: Props + a "   <n>" Project Data stream
        if (uc.exists(n => MppData.matcher(n).matches())) MsProject else null
      }
      else if (has("Layer")) EsriLayer
      else if (has("Dgn~Mf") && has("Dgn~S") && has("Dgn~H"))
        "image/vnd.dgn;version=8"
      else if (uc.exists(_.startsWith("__SUBSTG1.0_")) ||
        has("__properties_version1.0")) MediaTypes.MsOutlook
      else null
    Option(t)
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
