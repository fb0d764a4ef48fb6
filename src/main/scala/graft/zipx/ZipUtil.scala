package graft.zipx

import java.io.ByteArrayInputStream
import java.util.zip.{GZIPInputStream, ZipEntry, ZipInputStream}
import scala.collection.mutable.ArrayBuffer

/** In-row ZIP / gzip access over byte-array payloads.
  *
  * Reference: tika-parsers .../pkg/ZipParser.java:96-710 prefers
  * central-directory (ZipFile) order with a streaming fallback; our
  * payloads are row-sized byte arrays, so streaming order == written
  * order == central-directory order for the archives we synthesize
  * (SURVEY.md §2.6 "order = central-directory order").
  */
object ZipUtil {

  final case class Entry(name: String, data: Array[Byte], compressedSize: Long)

  val MaxEntryBytes: Int = 64 * 1024 * 1024

  /** Aggregate decompressed-bytes budget across ALL entries of one
    * archive. CEN records may all point at the same (or overlapping)
    * local data, so per-entry caps alone let a ~70 KB crafted archive
    * with 65535 CEN entries × 64 MB claims inflate terabytes; past this
    * budget the walk aborts as a detected bomb (same 256 MB ceiling as
    * SevenZ.MaxOutputBytes).
    */
  val MaxTotalBytes: Long = 256L * 1024 * 1024

  /** List all entries with their decompressed bytes.
    *
    * Streaming read first (the common, well-formed case); central-
    * directory fallback for the archives JDK's ZipInputStream rejects —
    * STORED entries with data descriptors (streaming writers), non-UTF-8
    * entry names (cp437 per APPNOTE when GP bit 11 is clear), which is
    * the reference's own ZipFile-preferred strategy
    * (pkg/ZipParser.java:96-710).
    */
  def entries(zipBytes: Array[Byte]): Vector[Entry] =
    try streamingEntries(zipBytes)
    catch {
      case b: graft.engine.ZipBombDetected => throw b
      case _: Exception => cenEntries(zipBytes)
    }

  private def streamingEntries(zipBytes: Array[Byte]): Vector[Entry] = {
    val out = new ArrayBuffer[Entry]()
    var totalOut = 0L
    val zin = new ZipInputStream(new ByteArrayInputStream(zipBytes))
    try {
      var e: ZipEntry = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory) {
          val data = readBounded(zin, MaxEntryBytes)
          totalOut += data.length
          if (totalOut > MaxTotalBytes) throw new graft.engine.ZipBombDetected
          out += Entry(e.getName, data, e.getCompressedSize)
        }
        zin.closeEntry()
        e = zin.getNextEntry
      }
    } finally zin.close()
    if (out.isEmpty && zipBytes.length > 22 && findEocd(zipBytes) >= 0)
      throw new IllegalStateException("streaming read saw no entries")
    out.toVector
  }

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Long = {
    var v = 0L; var i = 0
    while (i < 4) { v |= (b(o + i) & 0xffL) << (8 * i); i += 1 }
    v
  }

  private def findEocd(b: Array[Byte]): Int = {
    // EOCD (PK\5\6) sits within the last 64 KB + 22 bytes
    val lo = math.max(0, b.length - 65557)
    var i = b.length - 22
    while (i >= lo) {
      if (b(i) == 'P' && b(i + 1) == 'K' && b(i + 2) == 5 && b(i + 3) == 6)
        return i
      i -= 1
    }
    -1
  }

  /** Central-directory walk: entry metadata from CEN records (sizes are
    * authoritative there even with data descriptors), payload at the
    * local header's data offset, inflated directly.
    */
  private def cenEntries(zipBytes: Array[Byte]): Vector[Entry] = {
    val b = zipBytes
    val eocd = findEocd(b)
    if (eocd < 0) throw new IllegalStateException("no end-of-central-directory")
    var cdOff = le32(b, eocd + 16)
    var total = le16(b, eocd + 10)
    // zip64: locator (PK\6\7) directly precedes the EOCD
    if ((cdOff == 0xffffffffL || total == 0xffff) && eocd >= 20 &&
        b(eocd - 20) == 'P' && b(eocd - 19) == 'K' &&
        b(eocd - 18) == 6 && b(eocd - 17) == 7) {
      val eocd64 = le32(b, eocd - 12).toInt // low half is enough in-row
      if (eocd64 >= 0 && eocd64 + 56 <= b.length &&
          b(eocd64) == 'P' && b(eocd64 + 1) == 'K' &&
          b(eocd64 + 2) == 6 && b(eocd64 + 3) == 6) {
        total = le32(b, eocd64 + 32).toInt
        cdOff = le32(b, eocd64 + 48)
      }
    }
    // archives with prepended bytes (SFX stubs, crafted offsets) shift
    // every stored offset by the prefix length: eocdPos − (cdOff+cdSize)
    val cdSize = le32(b, eocd + 12)
    val shift = math.max(0L, eocd - (cdOff + cdSize))
    val out = new ArrayBuffer[Entry]()
    var totalOut = 0L
    var p = (cdOff + shift).toInt
    var n = 0
    val cp437 =
      try java.nio.charset.Charset.forName("IBM437")
      catch { case _: Exception => java.nio.charset.StandardCharsets.ISO_8859_1 }
    while (n < total && p + 46 <= b.length &&
        b(p) == 'P' && b(p + 1) == 'K' && b(p + 2) == 1 && b(p + 3) == 2) {
      val flags = le16(b, p + 8)
      val method = le16(b, p + 10)
      var compSize = le32(b, p + 20)
      var uncompSize = le32(b, p + 24)
      val nameLen = le16(b, p + 28)
      val extraLen = le16(b, p + 30)
      val commentLen = le16(b, p + 32)
      var localOff = le32(b, p + 42)
      val nameBytes = java.util.Arrays.copyOfRange(b, p + 46, p + 46 + nameLen)
      val utf8 = (flags & 0x800) != 0
      val name =
        if (utf8) new String(nameBytes, java.nio.charset.StandardCharsets.UTF_8)
        else graft.mime.MbCharsets.detect(nameBytes, nameBytes.length) match {
          // GBK/Big5/SJIS entry names are common in real archives and
          // carry no flag — sniff them like the statistical text chain
          case Some(cs) => new String(nameBytes, cs)
          case None => new String(nameBytes, cp437)
        }
      // zip64 extended-info extra field (id 0x0001) overrides 0xFFFFFFFF
      var xp = p + 46 + nameLen
      val xEnd = xp + extraLen
      while (xp + 4 <= xEnd) {
        val id = le16(b, xp); val sz = le16(b, xp + 2)
        if (id == 0x0001) {
          var fp = xp + 4
          if (uncompSize == 0xffffffffL && fp + 8 <= xEnd) {
            uncompSize = le32(b, fp); fp += 8
          }
          if (compSize == 0xffffffffL && fp + 8 <= xEnd) {
            compSize = le32(b, fp); fp += 8
          }
          if (localOff == 0xffffffffL && fp + 8 <= xEnd) {
            localOff = le32(b, fp); fp += 8
          }
        }
        xp += 4 + sz
      }
      val encrypted = (flags & 0x1) != 0
      if (!encrypted && !name.endsWith("/") && uncompSize <= MaxEntryBytes &&
          compSize <= b.length) {
        // aggregate budget BEFORE allocating: overlapping CEN entries can
        // each claim MaxEntryBytes, so the per-entry cap alone is not
        // enough (advice r3) — charge the claimed size up front
        totalOut += uncompSize
        if (totalOut > MaxTotalBytes) throw new graft.engine.ZipBombDetected
        // stored offsets drift in real archives (prepended prefixes; CEN
        // written without the data-descriptor bytes — the reference's
        // integrity-check fixture does exactly this). Verify the local
        // header actually carries THIS entry's name; when it doesn't,
        // resync by scanning forward for the matching local header.
        def localMatches(o: Long): Boolean = {
          if (o < 0 || o + 30 + nameLen > b.length) return false
          val oi = o.toInt
          if (!(b(oi) == 'P' && b(oi + 1) == 'K' && b(oi + 2) == 3 &&
                b(oi + 3) == 4)) return false
          if ((le16(b, oi + 26)) != nameLen) return false
          var k = 0
          while (k < nameLen) {
            if (b(oi + 30 + k) != nameBytes(k)) return false
            k += 1
          }
          true
        }
        var loL = -1L
        if (localMatches(localOff)) loL = localOff
        else if (localMatches(localOff + shift)) loL = localOff + shift
        else {
          var scan = localOff
          val limit = math.min(b.length.toLong - 4, localOff + 65536)
          while (loL < 0 && scan <= limit) {
            if (localMatches(scan)) loL = scan
            scan += 1
          }
        }
        val lo = loL.toInt
        if (loL >= 0) {
          val lNameLen = le16(b, lo + 26)
          val lExtraLen = le16(b, lo + 28)
          val dataOff = lo + 30 + lNameLen + lExtraLen
          if (dataOff + compSize <= b.length) {
            var data: Array[Byte] = method match {
              case 0 =>
                java.util.Arrays.copyOfRange(b, dataOff, (dataOff + compSize).toInt)
              case 8 =>
                val inf = new java.util.zip.Inflater(true)
                try {
                  inf.setInput(b, dataOff, compSize.toInt)
                  val outB = new Array[Byte](uncompSize.toInt)
                  var off = 0
                  while (off < outB.length && !inf.finished()) {
                    val r = inf.inflate(outB, off, outB.length - off)
                    if (r == 0 && inf.needsInput()) off = outB.length // truncated
                    else off += r
                  }
                  outB
                } finally inf.end()
              // legacy PKZIP methods (reference: commons-compress
              // Unshrinking/ExplodingInputStream; ZipParserTest moby.zip)
              case 1 =>
                try graft.pkgx.ZipLegacy.unshrink(b, dataOff, compSize.toInt,
                  uncompSize.toInt)
                catch { case _: Exception => null }
              case 6 =>
                try graft.pkgx.ZipLegacy.explode(b, dataOff, compSize.toInt,
                  uncompSize.toInt, flags)
                catch { case _: Exception => null }
              case _ => null // unsupported method (e.g. 99 = AES-encrypted)
            }
            // the legacy decoders are CRC-gated against the CEN record
            if (data != null && (method == 1 || method == 6)) {
              val crc = new java.util.zip.CRC32()
              crc.update(data)
              if (crc.getValue != le32(b, p + 16)) data = null
            }
            if (data != null) out += Entry(name, data, compSize)
          }
        }
      }
      p += 46 + nameLen + extraLen + commentLen
      n += 1
    }
    out.toVector
  }

  /** Entries decompressed into a name-indexed map in ONE pass —
    * multi-part formats (OOXML/ODF) read 5-7 parts, and per-part
    * `entry()` lookups would rescan the archive each time. `keep`
    * filters by name so embedded media blobs (which OOXML text
    * extraction never reads) are not buffered — a .pptx full of 50 MB
    * images must not pin gigabytes per task.
    */
  def entriesMap(zipBytes: Array[Byte],
      keep: String => Boolean = _ => true): Map[String, Array[Byte]] = {
    val out = scala.collection.mutable.LinkedHashMap[String, Array[Byte]]()
    try {
      val zin = new ZipInputStream(new ByteArrayInputStream(zipBytes))
      try {
        var e: ZipEntry = zin.getNextEntry
        while (e != null) {
          if (!e.isDirectory && keep(e.getName) && !out.contains(e.getName))
            out(e.getName) = readBounded(zin, MaxEntryBytes)
          zin.closeEntry()
          e = zin.getNextEntry
        }
      } finally zin.close()
    } catch {
      case b: graft.engine.ZipBombDetected => throw b
      case _: Exception =>
        // same central-directory fallback as entries() — XPS and other
        // streaming-writer packages defeat ZipInputStream
        out.clear()
        for (e <- entries(zipBytes) if keep(e.name) && !out.contains(e.name))
          out(e.name) = e.data
    }
    out.toMap
  }

  /** The parts OOXML/ODF text extraction can actually read. */
  val XmlParts: String => Boolean =
    n => n.endsWith(".xml") || n.endsWith(".rels") || n == "mimetype"

  /** Read one named entry (first match) without decompressing the rest. */
  def entry(zipBytes: Array[Byte], name: String): Option[Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(zipBytes))
    try {
      var e: ZipEntry = zin.getNextEntry
      while (e != null) {
        if (e.getName == name) return Some(readBounded(zin, MaxEntryBytes))
        zin.closeEntry()
        e = zin.getNextEntry
      }
      None
    } catch {
      case b: graft.engine.ZipBombDetected => throw b
      case _: Exception => entries(zipBytes).find(_.name == name).map(_.data)
    } finally zin.close()
  }

  /** Entry names only (cheap container probe — decompression skipped). */
  def entryNames(zipBytes: Array[Byte]): Vector[String] = {
    val out = new ArrayBuffer[String]()
    val zin = new ZipInputStream(new ByteArrayInputStream(zipBytes))
    try {
      var e: ZipEntry = zin.getNextEntry
      while (e != null) {
        out += e.getName
        zin.closeEntry()
        e = zin.getNextEntry
      }
    } catch {
      case _: Exception =>
        // streaming-writer zips (data descriptors on STORED entries):
        // names live in the central directory; truncated zips keep the
        // partial streaming list
        try {
          val cen = entries(zipBytes).map(_.name)
          out.clear(); out ++= cen
        } catch { case _: Exception => () }
    }
    finally zin.close()
    out.toVector
  }

  def gunzip(bytes: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new ByteArrayInputStream(bytes))
    try readBounded(in, MaxEntryBytes) finally in.close()
  }

  private def readBounded(in: java.io.InputStream, max: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var total = 0
    var n = in.read(buf)
    while (n >= 0) {
      total += n
      if (total > max) throw new graft.engine.ZipBombDetected
      out.write(buf, 0, n)
      n = in.read(buf)
    }
    out.toByteArray
  }
}

/** OPC (OOXML) container specialization of application/zip.
  *
  * Reference: tika-parsers .../detect/microsoft/ooxml/OPCPackageDetector
  * .java:60-200 — open the package, inspect `[Content_Types].xml` /
  * `_rels/.rels`, map the core-document content type to DOCX/XLSX/PPTX.
  * We probe entry names first (cheap) and read `[Content_Types].xml` only
  * when the package looks like OPC.
  */
object OpcDetector {
  import graft.mime.MediaTypes._

  def specialize(zipBytes: Array[Byte],
      nameHint: Option[String] = None): String = {
    val names = ZipUtil.entryNames(zipBytes)
    // ODF/EPUB carry a "mimetype" entry — conformant files put it first
    // and uncompressed, but real ones stray (ZipContainerDetector reads
    // it wherever it sits)
    if (names.contains("mimetype")) {
      val mt = ZipUtil.entry(zipBytes, "mimetype")
        .map(b => new String(b, java.nio.charset.StandardCharsets.US_ASCII).trim)
        .getOrElse("")
      mt match {
        case Odt | Ods | Odp | Epub => return mt
        case "application/vnd.adobe.indesign-idml-package" => return mt
        case _ => ()
      }
    }
    // XLZ is detected by glob only (reference: XLZParser has no magic;
    // a zip merely containing .xlf members must stay a plain zip so its
    // non-xlf siblings go through normal recursion)
    // iWork '09 packages: index.apxl = Keynote; index.xml's root element
    // distinguishes Pages from Numbers (iWorkPackageParser semantics)
    // iWork '13+ (IWork13PackageParser.IWORK13_COMMON_ENTRY): slide iwa
    // names mean Keynote, else the resource-name extension decides
    if (Iwork13Extractor.isIwork13(names))
      return Iwork13Extractor.subtype(names, nameHint)
    if (names.exists(n => n == "index.apxl" || n == "index.apxl.gz"))
      return "application/vnd.apple.keynote"
    if (names.contains("index.xml") &&
        !names.exists(n => n == "[Content_Types].xml" || n == "_rels/.rels")) {
      val head = ZipUtil.entry(zipBytes, "index.xml")
        .map(b => new String(b, 0, math.min(b.length, 512),
          java.nio.charset.StandardCharsets.UTF_8)).getOrElse("")
      if (head.contains("<sl:document")) return "application/vnd.apple.pages"
      if (head.contains("<ls:document")) return "application/vnd.apple.numbers"
      if (head.contains("<key:presentation")) return "application/vnd.apple.keynote"
    }
    // Frictionless data packages / WACZ web archives
    // (FrictionlessPackageDetector.java:75-106): datapackage.json is
    // required for both; archive/ members (or indexes/ + pages/) make it
    // a WACZ, a lone datapackage.json is a plain data package.
    if (names.contains("datapackage.json")) {
      val archive = names.exists(_.startsWith("archive/"))
      val indexes = names.exists(_.startsWith("indexes/"))
      val pages = names.exists(_.startsWith("pages/"))
      if (archive || (indexes && pages)) return graft.mime.MimeDb.Wacz
      // a lone WACZ part alongside the package stays a plain zip,
      // matching the reference's parts.size()==1 rule
      if (!indexes && !pages) return graft.mime.MimeDb.DataPackageZip
    }
    if (!names.exists(n => n == "[Content_Types].xml" || n == "_rels/.rels")) Zip
    else {
      // XPS/OpenXPS: a fixed-document-sequence part marks the package
      // (OPCPackageDetector.java:102-105,147,172-178 resolves the
      // fixedrepresentation relationship; the .fdseq part name is the
      // cheap equivalent — both XPS and OpenXPS packages carry one)
      if (names.exists(_.endsWith(".fdseq"))) Xps
      // 3MF: root relationship targets the 3D model part
      // (OPCPackageDetector.java:189-194 THREE_MF_DOCUMENT rel; the
      // conventional part name is the cheap equivalent)
      else if (names.contains("3D/3dmodel.model") ||
        ZipUtil.entry(zipBytes, "_rels/.rels").exists(b =>
          new String(b, java.nio.charset.StandardCharsets.UTF_8)
            .contains("3dmanufacturing/2013/01/3dmodel")))
        graft.mime.MimeDb.ThreeMf
      // Visio OOXML: subtype from the main-part content type
      // (OPCPackageDetector.java:128-145 OOXML_CONTENT_TYPES)
      else if (names.exists(_.startsWith("visio/document"))) {
        val ct = ZipUtil.entry(zipBytes, "[Content_Types].xml")
          .map(b => new String(b, java.nio.charset.StandardCharsets.UTF_8))
          .getOrElse("")
        // all-lowercase like the reference (MediaType normalizes;
        // OOXMLParserTest asserts "...macroenabled.12")
        if (ct.contains("visio.drawing.macroEnabled.main"))
          "application/vnd.ms-visio.drawing.macroenabled.12"
        else if (ct.contains("visio.template.macroEnabled.main"))
          "application/vnd.ms-visio.template.macroenabled.12"
        else if (ct.contains("visio.stencil.macroEnabled.main"))
          "application/vnd.ms-visio.stencil.macroenabled.12"
        else if (ct.contains("visio.template.main"))
          "application/vnd.ms-visio.template"
        else if (ct.contains("visio.stencil.main"))
          "application/vnd.ms-visio.stencil"
        else "application/vnd.ms-visio.drawing"
      }
      // entry-name shortcut (OOXML_HINTS, OPCPackageDetector.java:93-100)
      else if (names.exists(_.startsWith("word/document"))) Docx
      // binary workbook (MS-XLSB) before the generic xl/workbook match
      else if (names.contains("xl/workbook.bin")) Xlsb
      else if (names.exists(_.startsWith("xl/workbook"))) Xlsx
      else if (names.exists(_.startsWith("ppt/presentation"))) Pptx
      else {
        // fall back to [Content_Types].xml override scan
        ZipUtil.entry(zipBytes, "[Content_Types].xml").map { ct =>
          val s = new String(ct, java.nio.charset.StandardCharsets.UTF_8)
          if (s.contains("wordprocessingml.document.main")) Docx
          else if (s.contains("spreadsheetml.sheet.main")) Xlsx
          else if (s.contains("presentationml.presentation.main")) Pptx
          else TikaOoxml
        }.getOrElse(TikaOoxml)
      }
    }
  }
}
