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

  /** List all entries with their decompressed bytes (streaming order). */
  def entries(zipBytes: Array[Byte]): Vector[Entry] = {
    val out = new ArrayBuffer[Entry]()
    val zin = new ZipInputStream(new ByteArrayInputStream(zipBytes))
    try {
      var e: ZipEntry = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory) {
          val data = readBounded(zin, MaxEntryBytes)
          out += Entry(e.getName, data, e.getCompressedSize)
        }
        zin.closeEntry()
        e = zin.getNextEntry
      }
    } finally zin.close()
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
    } catch { case _: Exception => () } // truncated zip: keep what we saw
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

  def specialize(zipBytes: Array[Byte]): String = {
    val names = ZipUtil.entryNames(zipBytes)
    // ODF/EPUB carry a leading uncompressed "mimetype" entry
    if (names.headOption.contains("mimetype")) {
      val mt = ZipUtil.entry(zipBytes, "mimetype")
        .map(b => new String(b, java.nio.charset.StandardCharsets.US_ASCII).trim)
        .getOrElse("")
      mt match {
        case Odt | Ods | Odp | Epub => return mt
        case _ => ()
      }
    }
    if (!names.exists(n => n == "[Content_Types].xml" || n == "_rels/.rels")) Zip
    else {
      // entry-name shortcut (OOXML_HINTS, OPCPackageDetector.java:93-100)
      if (names.exists(_.startsWith("word/document"))) Docx
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
