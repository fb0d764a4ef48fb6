package graft.mime

import graft.mime.Magic._

/** Canonical media-type constants for the curated registry. */
object MediaTypes {
  val OctetStream = "application/octet-stream"
  val TextPlain = "text/plain"
  val Csv = "text/csv"
  val Html = "text/html"
  val Xml = "application/xml"
  val Pdf = "application/pdf"
  val Zip = "application/zip"
  val TikaOoxml = "application/x-tika-ooxml"
  val Docx = "application/vnd.openxmlformats-officedocument.wordprocessingml.document"
  val Xlsx = "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet"
  val Xlsb = "application/vnd.ms-excel.sheet.binary.macroenabled.12"
  val Pptx = "application/vnd.openxmlformats-officedocument.presentationml.presentation"
  val Xps = "application/vnd.ms-xpsdocument"
  val Gzip = "application/gzip"
  val Png = "image/png"
  val Jpeg = "image/jpeg"
  val Gif = "image/gif"
  val Tiff = "image/tiff"
  val Bmp = "image/bmp"
  val Webp = "image/webp"
  val Mp3 = "audio/mpeg"
  val Wav = "audio/vnd.wave"
  val Ogg = "audio/ogg"
  val Mp4 = "video/mp4"
  val Avi = "video/x-msvideo"
  val Matroska = "video/x-matroska"
  val TikaMsOffice = "application/x-tika-msoffice"
  val MsWord = "application/msword"
  val MsExcel = "application/vnd.ms-excel"
  val MsPowerPoint = "application/vnd.ms-powerpoint"
  val MsOutlook = "application/vnd.ms-outlook"
  val Rtf = "application/rtf"
  val Eml = "message/rfc822"
  val Mbox = "application/mbox"
  val Odt = "application/vnd.oasis.opendocument.text"
  val Ods = "application/vnd.oasis.opendocument.spreadsheet"
  val Odp = "application/vnd.oasis.opendocument.presentation"
  val Epub = "application/epub+zip"
  val AtomXml = "application/atom+xml"
  val RssXml = "application/rss+xml"
  val SvgXml = "image/svg+xml"
}

/** The compiled, broadcastable MIME registry: priority-sorted magic list,
  * supertype DAG, glob maps, and the detection orchestration.
  *
  * Reference semantics re-expressed (apache/tika):
  *  - orchestration: read <=64 KB prefix, magic match, XML-root
  *    refinement, name/declared hints that may only *specialize*
  *    (tika-core mime/MimeTypes.java:521-612);
  *  - priority-desc evaluation with early exit once priority drops below
  *    the best hit (MimeTypes.java:237-245);
  *  - supertype walk: explicit sub-class-of edges, else the +xml / +zip /
  *    text-prefix heuristics (mime/MediaTypeRegistry.java:185-205);
  *  - glob matching: exact-name hash → extension hash (longest first)
  *    (mime/Patterns.java:40-162).
  *
  * Signature sources: curated subset of tika-mimetypes.xml (citations per
  * entry; see SURVEY.md Appendix A).
  */
object MimeRegistry {

  import MediaTypes._

  /** Detection prefix budget (mime/MimeTypes.java:466-470). */
  val PrefixBytes = 64 * 1024

  /** Curated magic list (tika-mimetypes.xml line citations in comments). */
  val magics: Vector[Magic] = Vector(
    // text/html — tika-mimetypes.xml:7740-7793; the priority-60 regexes
    // anchor near the file head (offset 0 + short window), otherwise any
    // XML embedding a <body> element would win over the <?xml magic
    Magic(Html, 60, RegexClause("""(?i)<(html|head|body|title|div)[ >]""", window = 64)),
    Magic(Html, 60, RegexClause("""(?i)<h[123][ >]""", window = 64)),
    Magic(Html, 40, OrClause(Seq(
      istringRange(0, 64, "<!DOCTYPE HTML"),
      istringRange(0, 64, "<head"),
      istringRange(0, 64, "<title"),
      istringRange(0, 64, "<html")
    ))),
    // wide low-priority match (tika-mimetypes.xml:7781-7788) — MIME
    // mail archives whose first part is HTML (.mht) stay
    // multipart/related because that magic carries priority 60
    Magic(Html, 20, stringRange(128, 8192, "<html")),
    // application/xml — tika-mimetypes.xml:5681-5709
    Magic(Xml, 50, OrClause(Seq(
      string(0, "<?xml"),
      string(0, "<?XML"),
      BytesClause(0, 0, Array(0xef, 0xbb, 0xbf).map(_.toByte) ++ ascii("<?xml")),
      BytesClause(0, 0, Array(0xff, 0xfe).map(_.toByte) ++ utf16le("<?xml")),
      BytesClause(0, 0, Array(0xfe, 0xff).map(_.toByte) ++ utf16be("<?xml"))
    ))),
    Magic(Xml, 30, string(0, "<!--")),
    // application/pdf — tika-mimetypes.xml:834-865
    Magic(Pdf, 50, OrClause(Seq(
      string(0, "%PDF-"),
      BytesClause(0, 0, Array(0xef, 0xbb, 0xbf).map(_.toByte) ++ ascii("%PDF-"))
    ))),
    Magic(Pdf, 40, AndClause(Seq(
      stringRange(0, 128, "%%"),
      OrClause(Seq(stringRange(1, 512, "%PDF-1."), stringRange(1, 512, "%PDF-2.")))
    ))),
    Magic(Pdf, 20, OrClause(Seq(stringRange(1, 512, "%PDF-1."), stringRange(1, 512, "%PDF-2.")))),
    // application/x-tika-ooxml — tika-mimetypes.xml:5473-5482
    Magic(TikaOoxml, 50, AndClause(Seq(
      bytes(0, 'P', 'K', 3, 4),
      OrClause(Seq(stringRange(30, 30, "[Content_Types].xml"), stringRange(30, 30, "_rels/.rels")))
    ))),
    // application/zip — tika-mimetypes.xml:5760-5772
    Magic(Zip, 50, OrClause(Seq(
      bytes(0, 'P', 'K', 3, 4), bytes(0, 'P', 'K', 5, 6), bytes(0, 'P', 'K', 7, 8)
    ))),
    // application/gzip — tika-mimetypes.xml:4195-4210
    Magic(Gzip, 45, bytes(0, 0x1f, 0x8b)),
    // image/png — tika-mimetypes.xml:6685-6692
    Magic(Png, 50, bytes(0, 0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)),
    // image/jpeg — tika-mimetypes.xml (ffd8ff)
    Magic(Jpeg, 50, bytes(0, 0xff, 0xd8, 0xff)),
    // image/gif
    Magic(Gif, 50, OrClause(Seq(string(0, "GIF87a"), string(0, "GIF89a")))),
    // image/tiff — II*\0 (LE) or MM\0* (BE)
    Magic(Tiff, 50, OrClause(Seq(
      bytes(0, 'I', 'I', 0x2a, 0x00), bytes(0, 'M', 'M', 0x00, 0x2a)))),
    // image/bmp — "BM" + zeroed reserved words (avoids text false hits)
    Magic(Bmp, 50, AndClause(Seq(string(0, "BM"), bytes(6, 0, 0, 0, 0)))),
    // RIFF containers: WEBP / WAVE / AVI (format tag at offset 8)
    Magic(Webp, 50, AndClause(Seq(string(0, "RIFF"), string(8, "WEBP")))),
    Magic(Wav, 50, AndClause(Seq(string(0, "RIFF"), string(8, "WAVE")))),
    Magic(Avi, 50, AndClause(Seq(string(0, "RIFF"), string(8, "AVI ")))),
    // audio/mpeg — ID3v2 tag
    Magic(Mp3, 50, string(0, "ID3")),
    // audio/ogg
    Magic(Ogg, 50, string(0, "OggS")),
    // video/mp4 — 'ftyp' box at offset 4
    Magic(Mp4, 50, string(4, "ftyp")),
    // video/x-matroska (also webm) — EBML header
    Magic(Matroska, 50, bytes(0, 0x1a, 0x45, 0xdf, 0xa3)),
    // legacy OLE2/CFB (doc/xls/ppt/msg) — recognized, parsed as
    // unsupported in v1 (reference OfficeParser needs POI)
    Magic(TikaMsOffice, 50,
      bytes(0, 0xd0, 0xcf, 0x11, 0xe0, 0xa1, 0xb1, 0x1a, 0xe1)),
    // application/rtf — "{\rtf" @0
    Magic(Rtf, 50, string(0, "{\\rtf")),
    // application/mbox — postmark "From " (no colon) at offset 0
    Magic(Mbox, 50, string(0, "From ")),
    // message/rfc822 — leading header-field magics (tika-mimetypes rfc822 entry)
    Magic(Eml, 50, OrClause(Seq(
      string(0, "Relay-Version:"), string(0, "#! rnews"), string(0, "Forward to"),
      string(0, "Pipe to"), string(0, "Return-Path:"), string(0, "Received:"),
      string(0, "Message-ID:"), string(0, "Message-Id:"), string(0, "MIME-Version:"),
      string(0, "From:"), string(0, "Delivered-To:")
    ))),
    // text/plain BOM magics — tika-mimetypes.xml:7812-7835
    Magic(TextPlain, 20, OrClause(Seq(
      bytes(0, 0xfe, 0xff), bytes(0, 0xff, 0xfe), bytes(0, 0xef, 0xbb, 0xbf)
    )))
  ).appendedAll(MimeDb.magics).sorted

  /** First-byte skip key per magic: the required value of data(0) when
    * the clause can only match with that exact first byte, or -1 when
    * it cannot be keyed (offset ranges, case folding, ORs). The detect
    * loop compares one int before evaluating the clause tree — most
    * signatures are exact offset-0 strings, so a typical document
    * evaluates a handful of clauses instead of the full registry.
    * Purely an evaluation-order shortcut: skipped clauses are exactly
    * those that cannot match, so results are identical.
    */
  private def firstByteKey(c: Clause): Int = c match {
    case b: BytesClause
        if b.offStart == 0 && b.offEnd == 0 && !b.ignoreCase &&
          b.value.nonEmpty && (b.mask == null || (b.mask(0) & 0xff) == 0xff) =>
      b.value(0) & 0xff
    case a: AndClause if a.clauses.nonEmpty =>
      // AndClause.matches is forall; its head is the parent signature
      firstByteKey(a.clauses.head)
    case n: NumericClause if n.off == 0 =>
      val shift = if (n.bigEndian) (n.width - 1) * 8 else 0
      if (((n.mask >>> shift) & 0xff) == 0xff) ((n.value >>> shift) & 0xff).toInt
      else -1
    case _ => -1
  }
  private val magicArr: Array[Magic] = magics.toArray
  private val magicFirstKeys: Array[Int] =
    magicArr.map(m => firstByteKey(m.clause))

  private def utf16le(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
  private def utf16be(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_16BE)

  /** Explicit sub-class-of edges (tika-mimetypes.xml sub-class-of; 384
    * edges in full db — curated subset).
    */
  val superTypes: Map[String, String] = Map(
    Html -> TextPlain,
    Csv -> TextPlain,
    Xml -> TextPlain,
    TikaOoxml -> Zip,
    Docx -> TikaOoxml,
    Xlsx -> TikaOoxml,
    Xlsb -> TikaOoxml, // tika-mimetypes.xml:2075-2079
    Pptx -> TikaOoxml,
    // visio OOXML sub-classes of x-tika-visio-ooxml -> x-tika-ooxml
    // (tika-mimetypes.xml:3146-3173); the hint must specialize zip
    "application/vnd.ms-visio.drawing" -> TikaOoxml,
    "application/vnd.ms-visio.template" -> TikaOoxml,
    "application/vnd.ms-visio.stencil" -> TikaOoxml,
    "application/vnd.ms-visio.drawing.macroenabled.12" -> TikaOoxml,
    "application/vnd.ms-visio.template.macroenabled.12" -> TikaOoxml,
    "application/vnd.ms-visio.stencil.macroenabled.12" -> TikaOoxml,
    Rtf -> TextPlain,
    Eml -> TextPlain,
    Mbox -> TextPlain,
    MsWord -> TikaMsOffice,
    "application/x-mspublisher" -> TikaMsOffice,
    "application/sldworks" -> TikaMsOffice,
    "application/x-tika-msworks-spreadsheet" -> TikaMsOffice,
    "application/vnd.ms-works" -> TikaMsOffice,
    MsExcel -> TikaMsOffice,
    MsPowerPoint -> TikaMsOffice,
    MsOutlook -> TikaMsOffice,
    Odt -> Zip,
    Ods -> Zip,
    Odp -> Zip,
    Epub -> Zip,
    AtomXml -> Xml,
    RssXml -> Xml,
    SvgXml -> Xml,
    TextPlain -> OctetStream
  ) ++ MimeDb.superTypes

  /** MediaTypeRegistry.getSupertype:185-205 — explicit edge, else
    * +xml/+zip/text heuristics, else octet-stream root.
    */
  def superType(t: String): Option[String] = {
    if (t == OctetStream) None
    else superTypes.get(t).orElse {
      if (t.endsWith("+xml")) Some(Xml)
      else if (t.endsWith("+zip")) Some(Zip)
      else if (t.startsWith("text/") && t != TextPlain) Some(TextPlain)
      else Some(OctetStream)
    }
  }

  /** Is `a` equal to or a specialization of `b`? (walk supertype chain) */
  def isSpecializationOf(a: String, b: String): Boolean = {
    var cur: Option[String] = Some(a)
    while (cur.isDefined) {
      if (cur.get == b) return true
      cur = superType(cur.get)
    }
    false
  }

  /** Extension → type: the 782-entry reference-suite table under the
    * curated core (curated entries win on conflict —
    * mime/Patterns.java extension hash).
    */
  val extGlobs: Map[String, String] = MimeDb.extGlobs ++ Map(
    "html" -> Html, "htm" -> Html, "xml" -> Xml, "pdf" -> Pdf, "zip" -> Zip,
    "docx" -> Docx, "xlsx" -> Xlsx, "pptx" -> Pptx, "gz" -> Gzip,
    "rtf" -> Rtf, "eml" -> Eml, "odt" -> Odt, "ods" -> Ods, "odp" -> Odp,
    "epub" -> Epub,
    "png" -> Png, "jpg" -> Jpeg, "jpeg" -> Jpeg, "gif" -> Gif, "txt" -> TextPlain,
    // newer-than-httpd-mime.types globs from tika-mimetypes.xml itself
    "md" -> MimeDb.Markdown, "mkd" -> MimeDb.Markdown,
    "mdtext" -> MimeDb.Markdown, "markdown" -> MimeDb.Markdown,
    "json" -> MimeDb.Json, "parquet" -> MimeDb.Parquet,
    "zst" -> MimeDb.Zstd, "lz4" -> MimeDb.Lz4, "warc" -> MimeDb.Warc,
    "heic" -> MimeDb.Heic, "avif" -> MimeDb.Avif, "webp" -> Webp,
    "webm" -> MimeDb.WebmVideo, "msg" -> MsOutlook,
    // XLZ has no content marker distinct from plain zip — the reference
    // detects it by glob only (tika-mimetypes.xml x-xliff+zip)
    "xlz" -> MimeDb.Xlz,
    // round-4 parity tranche (glob entries from tika-mimetypes.xml; br /
    // brotli and pack have no magic in the reference either)
    "br" -> MimeDb.Brotli, "brotli" -> MimeDb.Brotli,
    "pack" -> MimeDb.Pack200, "gpg" -> MimeDb.PgpEncrypted,
    "axx" -> MimeDb.AxCrypt, "indd" -> MimeDb.Indd,
    "sd2" -> MimeDb.SasV6,
    "wq1" -> MimeDb.QpwDos14, "wkq" -> MimeDb.QpwDos14,
    "wq2" -> MimeDb.QpwDos5, "wb1" -> MimeDb.QpwWin15,
    "wb2" -> MimeDb.QpwWin6, "wb3" -> MimeDb.Qpw,
    "dcx" -> MimeDb.Dcx, "jb2" -> MimeDb.Jbig2, "jbig2" -> MimeDb.Jbig2,
    "hfa" -> MimeDb.ErdasHfa, "myi" -> MimeDb.MySqlMyisamCIdx,
    "myd" -> MimeDb.MySqlMyisamData, "hprof" -> MimeDb.HprofBin,
    "dgn" -> MimeDb.Dgn
  )

  /** XML root-element → refined type (root-XML entries; e.g. text/html
    * root html/HTML, tika-mimetypes.xml:7748-7761).
    */
  val xmlRootTypes: Map[String, String] = Map(
    "html" -> Html, "HTML" -> Html,
    "feed" -> AtomXml, "rss" -> RssXml, "svg" -> SvgXml,
    "DIF" -> graft.mime.MimeDb.DifXml,
    "plist" -> "application/x-plist",
    "tmx" -> graft.mime.MimeDb.Tmx,
    "xliff" -> graft.mime.MimeDb.Xliff,
    "FictionBook" -> graft.mime.MimeDb.FictionBook,
    // Office 2003 single-file XML formats (root-XML clauses in
    // tika-mimetypes.xml for vnd.ms-wordml / vnd.ms-spreadsheetml)
    "wordDocument" -> graft.xmlx.MsXml2003Extractor.WordMl,
    "Workbook" -> graft.xmlx.MsXml2003Extractor.SpreadsheetMl,
    // flat OpenDocument (root-XML clause, tika-mimetypes.xml:2573);
    // the bare localName is guarded by the office namespace in detect()
    "document" -> graft.mime.MimeDb.FlatOd,
    // namespace-disambiguated in detect(): word2006ml vs EPUB OPF
    "package" -> graft.mime.MimeDb.Word2006Ml
  )

  /** Full detection pipeline over the leading bytes of a payload.
    *
    * Order (MimeTypes.detect:521-589 + DefaultDetector:135-155):
    *  1. magic match (priority desc, early exit);
    *  2. container specialization: zip → OOXML probing is done by the
    *     caller (needs full bytes, not the 64 KB prefix) — here only the
    *     [Content_Types].xml-at-30 signature fires;
    *  3. XML root refinement for xml/html results;
    *  4. text/binary fallback when nothing matched;
    *  5. name hint may only specialize (MimeTypes.java:597-612).
    */
  def detect(data: Array[Byte], nameHint: Option[String] = None): String = {
    if (data.isEmpty) return OctetStream
    val prefix =
      if (data.length <= PrefixBytes) data else java.util.Arrays.copyOf(data, PrefixBytes)

    var best: String = null
    var bestPriority = -1
    val b0 = prefix(0) & 0xff
    var mi = 0
    var done = false
    while (mi < magicArr.length && !done) {
      val m = magicArr(mi)
      val fk = magicFirstKeys(mi)
      mi += 1
      if (best != null && m.priority < bestPriority) done = true // early exit :237-245
      else if (fk >= 0 && fk != b0) () // first byte can't match — skip
      else if (m.clause.matches(prefix)) {
        if (best == null) { best = m.mediaType; bestPriority = m.priority }
        else if (m.priority == bestPriority && isSpecializationOf(m.mediaType, best)) {
          // equal-priority more-specific wins (most-specific rule :583)
          best = m.mediaType
        }
      }
    }

    var result = best

    // XML root refinement (MimeTypes.java:253-289). A root-XML hit wins
    // outright; an html magic hit whose actual root is a non-html XML
    // root (e.g. <rss> containing an early <title>) downgrades to the
    // root's type — the reference's root-XML clauses are requirements,
    // not hints.
    if (result == Xml || result == Html) {
      val xmlDecl = startsWithXmlDecl(prefix)
      XmlRootExtractor.rootElement(prefix) match {
        case Some(root) =>
          xmlRootTypes.get(root) match {
            case Some(_) if root == "package" =>
              // root-XML "package" is namespace-ambiguous: the OOXML
              // single-file serialization (vnd.ms-word2006ml) vs the
              // EPUB OPF package (oebps-package+xml); plain <package>
              // stays generic XML (tika-mimetypes.xml:991, :2770)
              val head = new String(prefix, 0,
                math.min(prefix.length, 8192),
                java.nio.charset.StandardCharsets.ISO_8859_1)
              if (head.contains("schemas.microsoft.com/office/2006/xmlPackage"))
                result = graft.mime.MimeDb.Word2006Ml
              else if (head.contains("www.idpf.org/2007/opf"))
                result = graft.mime.MimeDb.Opf
              else if (result == Html && xmlDecl) result = Xml
            case Some(refined) if refined == graft.mime.MimeDb.FlatOd =>
              // root-XML namespace guard (the reference clause requires
              // urn:...:office:1.0); the office:mimetype root attribute
              // then picks the flat subtype, which the reference only
              // resolves during parse
              val head = new String(prefix, 0,
                math.min(prefix.length, 8192),
                java.nio.charset.StandardCharsets.ISO_8859_1)
              if (head.contains("urn:oasis:names:tc:opendocument:xmlns:office:1.0")) {
                result =
                  if (head.contains("office:mimetype=\"application/vnd.oasis.opendocument.text\""))
                    graft.mime.MimeDb.FlatOdt
                  else if (head.contains("office:mimetype=\"application/vnd.oasis.opendocument.spreadsheet\""))
                    graft.mime.MimeDb.FlatOds
                  else if (head.contains("office:mimetype=\"application/vnd.oasis.opendocument.presentation\""))
                    graft.mime.MimeDb.FlatOdp
                  else refined
              } else if (result == Html && xmlDecl) result = Xml
            case Some(refined) => result = refined
            case None => if (result == Html && xmlDecl) result = Xml
          }
        case None => ()
      }
    }

    // fallback: text sniff then octet-stream (MimeTypes.java:294-303)
    if (result == null) {
      result = if (TextDetector.isText(prefix)) TextPlain else OctetStream
    }

    // name hint only specializes (applyHint, MimeTypes.java:597-612)
    nameHint.flatMap(fromName).foreach { hinted =>
      if (hinted != result && isSpecializationOf(hinted, result)) result = hinted
    }

    result
  }

  private def startsWithXmlDecl(data: Array[Byte]): Boolean = {
    var i = 0
    // skip BOM
    if (data.length >= 3 && (data(0) & 0xff) == 0xef && (data(1) & 0xff) == 0xbb &&
        (data(2) & 0xff) == 0xbf) i = 3
    data.length >= i + 5 && data(i) == '<' && data(i + 1) == '?' &&
      (data(i + 2) == 'x' || data(i + 2) == 'X') &&
      (data(i + 3) == 'm' || data(i + 3) == 'M') &&
      (data(i + 4) == 'l' || data(i + 4) == 'L')
  }

  /** Preferred extension (with leading dot) for a media type — the
    * MimeType.getExtension analog used when naming unnamed embedded
    * payloads. Explicit entries for the common embedded types; inverted
    * glob table (deterministic shortest-then-alpha pick) as fallback;
    * ".bin" when unknown.
    */
  def extensionFor(mime: String): String =
    preferredExt.getOrElse(mime, invertedGlobExt.getOrElse(mime, ".bin"))

  private val preferredExt: Map[String, String] = Map(
    MediaTypes.MsWord -> ".doc", MediaTypes.MsExcel -> ".xls",
    MediaTypes.MsPowerPoint -> ".ppt", MediaTypes.MsOutlook -> ".msg",
    MediaTypes.Docx -> ".docx", MediaTypes.Xlsx -> ".xlsx",
    MediaTypes.Pptx -> ".pptx", MediaTypes.Pdf -> ".pdf",
    MediaTypes.Zip -> ".zip", MediaTypes.Html -> ".html",
    MediaTypes.TextPlain -> ".txt", MediaTypes.Xml -> ".xml",
    "image/jpeg" -> ".jpg", "image/png" -> ".png", "image/gif" -> ".gif",
    "image/bmp" -> ".bmp", "image/emf" -> ".emf", "image/wmf" -> ".wmf",
    "image/tiff" -> ".tif", MediaTypes.TikaMsOffice -> ".ole2",
    MediaTypes.OctetStream -> ".bin")

  private lazy val invertedGlobExt: Map[String, String] =
    MimeDbGlobs.pairs.toSeq.groupBy(_._2).map { case (t, exts) =>
      t -> ("." + exts.map(_._1).minBy(e => (e.length, e)))
    }

  /** Name-glob hint, all three Patterns tiers (Patterns.java:40-162):
    * exact-name hash → extension hash → regex globs.
    */
  def fromName(name: String): Option[String] = {
    val base = {
      val slash = math.max(name.lastIndexOf('/'), name.lastIndexOf('\\'))
      if (slash >= 0) name.substring(slash + 1) else name
    }
    MimeDb.exactNames.get(base).orElse {
      val dot = base.lastIndexOf('.')
      if (dot < 0 || dot == base.length - 1) None
      else extGlobs.get(base.substring(dot + 1).toLowerCase)
    }.orElse {
      // regex tier matches the whole file name (Patterns.java:141-162)
      MimeDb.regexGlobs.collectFirst {
        case (p, t) if p.matcher(base).matches() => t
      }
    }
  }
}
