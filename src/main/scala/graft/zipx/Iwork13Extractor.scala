package graft.zipx

import graft.engine.MetaSink
import graft.textparse.PlistExtractor
import graft.textparse.PlistExtractor._

/** iWork '13+ packages (zip with `Metadata/BuildVersionHistory.plist`
  * and snappy-compressed `Index/....iwa` protobuf archives).
  *
  * Reference: tika-parser-apple-module
  * `iwork/iwana/IWork13PackageParser.java` — parsing the iwa protobufs
  * is a declared no-op there too; the surface is plist document
  * properties (`iworks:*`), the build-version-history array, the
  * 36-char DocumentIdentifier, the preview.jpg thumbnail as an
  * embedded doc, and any other non-iwa member as an embedded doc.
  * Subtype: Slide/MasterSlide iwa names mean Keynote; otherwise the
  * resource-name extension decides (guessTypeByExtension), else
  * `vnd.apple.unknown.13`.
  */
object Iwork13Extractor {

  val Keynote13 = "application/vnd.apple.keynote.13"
  val Numbers13 = "application/vnd.apple.numbers.13"
  val Pages13 = "application/vnd.apple.pages.13"
  val Unknown13 = "application/vnd.apple.unknown.13"

  /** Cheap container check for the zip specializer. */
  def isIwork13(names: Seq[String]): Boolean =
    names.contains("Metadata/BuildVersionHistory.plist")

  def subtype(names: Seq[String], nameHint: Option[String]): String = {
    if (names.exists(n => n.startsWith("Index/MasterSlide") ||
        n.startsWith("Index/Slide"))) return Keynote13
    val fn = nameHint.map(_.toLowerCase(java.util.Locale.US)).getOrElse("")
    if (fn.endsWith(".numbers")) Numbers13
    else if (fn.endsWith(".pages")) Pages13
    else if (fn.endsWith(".key")) Keynote13
    else Unknown13
  }

  def extract(zipBytes: Array[Byte], meta: MetaSink,
      child: (String, Array[Byte]) => Unit): Unit = {
    val parts = ZipUtil.entriesMap(zipBytes, _ => true)

    parts.get("Metadata/BuildVersionHistory.plist").foreach { b =>
      try PlistExtractor.parseRoot(b) match {
        case PArr(items) => items.foreach(o =>
          meta.add("iworks:build-version-history", scalar(o)))
        case _ => ()
      } catch { case _: Exception => () }
    }
    parts.get("Metadata/Properties.plist").foreach { b =>
      try PlistExtractor.parseRoot(b) match {
        case PDict(entries) => entries.foreach { case (k, v) =>
          meta.set("iworks:" + k, scalar(v))
        }
        case _ => ()
      } catch { case _: Exception => () }
    }
    parts.get("Metadata/DocumentIdentifier")
      .filter(_.length >= 36)
      .foreach(b => meta.set("iworks:document-id",
        new String(b, 0, 36, java.nio.charset.StandardCharsets.ISO_8859_1)))

    parts.foreach { case (name, data) =>
      val base = graft.ole2.OleEmbedded.baseName(name)
      if (base == "preview.jpg") {
        meta.add("iworks:thumbnail", name)
        try child(base, data) catch { case _: Exception => () }
      } else if (!name.endsWith(".iwa") && !name.endsWith(".plist") &&
          base != "preview-micro.jpg" && base != "preview-web.jpg" &&
          base != "DocumentIdentifier" && data.nonEmpty) {
        try child(base, data) catch { case _: Exception => () }
      }
    }
  }

  private def scalar(o: PObj): String = o match {
    case PStr(s) => s
    case PNum(s) => s
    case PBool(b) => b.toString
    case PDate(d) => d
    case PUid(v) => v.toString
    case PArr(items) => items.map(scalar).mkString(", ")
    case PDict(es) => es.map { case (k, v) => s"$k=${scalar(v)}" }.mkString(", ")
    case _ => ""
  }
}
