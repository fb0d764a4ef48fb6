package graft.mime

import graft.mime.Magic._

/** Registry breadth beyond the round-1 curated core: ~40 additional
  * magic-detected types (archives, compressors, fonts, executables,
  * scripts, scientific), the exact-name and regex glob tiers, and their
  * supertype edges.
  *
  * Every signature below is transcribed from the reference database
  * `tika-core/src/main/resources/org/apache/tika/mime/tika-mimetypes.xml`
  * (1,696 types; value-type semantics per detect/MagicDetector.java:
  * 241-299). Line refs omitted per entry — the type name keys the XML.
  */
object MimeDb {

  // media-type constants used by dispatch / tests
  val Tar = "application/x-tar"
  val Gtar = "application/x-gtar"
  val OneNote = "application/onenote"
  val SevenZ = "application/x-7z-compressed"
  val Rar = "application/x-rar-compressed"
  val Bzip2 = "application/x-bzip2"
  val Xz = "application/x-xz"
  val Zstd = "application/zstd"
  val Lz4 = "application/x-lz4"
  val Cpio = "application/x-cpio"
  val Ar = "application/x-archive"
  val Deb = "application/x-debian-package"
  val Rpm = "application/x-rpm"
  val Iso = "application/x-iso9660-image"
  val Cab = "application/vnd.ms-cab-compressed"
  val Dmg = "application/x-apple-diskimage"
  val Marc = "application/marc"
  val Pict = "image/x-pict"
  val Sh = "application/x-sh"
  val Python = "text/x-python"
  val CSrc = "text/x-csrc"
  val Ics = "text/calendar"
  val VCard = "text/vcard"
  val MsOwner = "application/x-ms-owner"
  val Json = "application/json"
  val Markdown = "text/markdown"
  val JavaClass = "application/java-vm"
  val Wasm = "application/wasm"
  val Elf = "application/x-elf"
  val ElfExe = "application/x-executable"
  val ElfLib = "application/x-sharedlib"
  val ElfObj = "application/x-object"
  val ElfCore = "application/x-coredump"
  val MsExe = "application/x-msdownload"
  val Swf = "application/x-shockwave-flash"
  val PostScript = "application/postscript"
  val Sqlite = "application/x-sqlite3"
  val Parquet = "application/x-parquet"
  val Ttf = "application/x-font-ttf"
  val Otf = "application/x-font-otf"
  val Flac = "audio/x-flac"
  val Midi = "audio/midi"
  val M4a = "audio/mp4"
  val M4v = "video/x-m4v"
  val Flv = "video/x-flv"
  val MpegVideo = "video/mpeg"
  val QuickTime = "video/quicktime"
  val WebmVideo = "video/webm"
  val Ico = "image/vnd.microsoft.icon"
  val Psd = "image/vnd.adobe.photoshop"
  val Heic = "image/heic"
  val Avif = "image/avif"
  val Jp2 = "image/jp2"
  val Xcf = "image/x-xcf"
  val Warc = "application/warc"
  val Mobi = "application/x-mobipocket-ebook"
  val Icc = "application/vnd.iccprofile"
  val Hdf = "application/x-hdf"
  val Matlab = "application/x-matlab-data"
  val MsAccess = "application/x-msaccess"
  val MsWrite = "application/x-mswrite"
  val Lzip = "application/x-lzip"
  // round-3 tranche: fonts, executables, db/science files, AV containers
  val Woff = "font/woff"
  val Woff2 = "font/woff2"
  val Chm = "application/vnd.ms-htmlhelp"
  val Djvu = "image/vnd.djvu"
  val Aiff = "audio/x-aiff"
  val AuBasic = "audio/basic"
  val Amr = "audio/amr"
  val MachO = "application/x-mach-o"
  val MachOFat = "application/x-mach-o-universal"
  val Dex = "application/x-dex"
  val Exr = "image/x-exr"
  val Pbm = "image/x-portable-bitmap"
  val Pgm = "image/x-portable-graymap"
  val Ppm = "image/x-portable-pixmap"
  val Pcx = "image/x-pcx"
  val Pcap = "application/vnd.tcpdump.pcap"
  val Pcapng = "application/vnd.tcpdump.pcapng"
  val Wpd = "application/vnd.wordperfect"
  val SquashFs = "application/x-squashfs"
  val XarArchive = "application/x-xar"
  val Torrent = "application/x-bittorrent"
  val Jxl = "image/jxl"
  val Crx = "application/x-chrome-package"
  val Avi2 = "video/x-msvideo"
  val RealMedia = "application/vnd.rn-realmedia"
  val Lha = "application/x-lha"
  val Arj = "application/x-arj"
  val UnixDump = "application/x-tika-unix-dump"
  val Zlib = "application/zlib"
  val Lzma = "application/x-lzma"
  val SnappyFramed = "application/x-snappy-framed"
  val Netcdf = "application/x-netcdf"
  val Grib = "application/x-grib"
  val Fits = "application/fits"
  val Dicom = "application/dicom"
  val Wmf = "image/wmf" // alias application/x-msmetafile (tika-mimetypes.xml:6969)
  val Emf = "image/emf"
  val Anpa = "text/vnd.iptc.anpa"

  // round-3 second tranche (the bare OggS container magic already exists
  // as audio/ogg in the curated core; the codec subtypes below outrank it)
  val OggVorbis = "audio/vorbis"
  val OggOpus = "audio/opus"
  val OggTheora = "video/theora"
  val OggSpeex = "audio/speex"
  val OggFlacA = "audio/x-oggflac"
  val Asf = "video/x-ms-asf"
  val Pst = "application/vnd.ms-outlook-pst"
  val Tnef = "application/vnd.ms-tnef"
  val PemCert = "application/x-x509-cert;format=pem"
  val UnixCompress = "application/x-compress"
  val Dvi = "application/x-dvi"
  val Type1Font = "application/x-font-type1"
  val BPlist = "application/x-bplist"
  val Eot = "application/vnd.ms-fontobject"
  val BinHex = "application/mac-binhex40"
  val ArcArchive = "application/x-internet-archive"
  val HttpResponse = "application/x-httpresponse"
  val Icns = "image/icns"
  val Bpg = "image/x-bpg"
  val Pam = "image/x-portable-arbitrarymap"
  val SgiRgb = "image/x-rgb"
  val CanonCr2 = "image/x-canon-cr2"
  val Mng = "video/x-mng"
  val Jng = "video/x-jng"
  val Caf = "audio/x-caf"
  val AmrWb = "audio/amr-wb"
  val Sid = "audio/prs.sid"
  val RealAudio = "audio/x-pn-realaudio"
  val Vtt = "text/vtt"
  val Dwf = "model/vnd.dwf"
  val Dwg = "image/vnd.dwg"
  val NesRom = "application/x-nesrom"
  val Zoo = "application/x-zoo"
  val StuffIt = "application/x-stuffit"
  val Shapefile = "application/x-shapefile"
  val SasData = "application/x-sas-data"
  val EnviHdr = "application/envi.hdr"
  val Wacz = "application/x-wacz"
  val DataPackageZip = "application/x-vnd.datapackage+zip"
  val VBasic = "text/x-vbasic"
  val Basic = "text/x-basic"
  val Word2006Ml = "application/vnd.ms-word2006ml"
  val Opf = "application/oebps-package+xml"
  // MHTML web archive (RFC 2557; tika-mimetypes.xml:7495-7512)
  val MhtRelated = "multipart/related"
  val ActiveMime = "application/x-activemime"
  // single-XML OpenDocument family (tika-mimetypes.xml:2571-2592)
  val FlatOd = "application/vnd.oasis.opendocument.tika.flat.document"
  val FlatOdt = "application/vnd.oasis.opendocument.flat.text"
  val FlatOds = "application/vnd.oasis.opendocument.flat.spreadsheet"
  val FlatOdp = "application/vnd.oasis.opendocument.flat.presentation"
  val SpssSav = "application/x-spss-sav"
  val StataDta = "application/x-stata-dta"
  val Jks = "application/x-java-keystore"
  val Hwp = "application/x-hwp"
  val HwpV5 = "application/x-hwp-v5"
  val Qpw = "application/x-quattro-pro"
  val Lotus123 = "application/vnd.lotus-1-2-3"
  val Lotus123V1 = "application/vnd.lotus-1-2-3;version=1"
  val Lotus123V2 = "application/vnd.lotus-1-2-3;version=2"
  val Lotus123V3 = "application/vnd.lotus-1-2-3;version=3"
  val Lotus123V4 = "application/vnd.lotus-1-2-3;version=4"
  val Lotus123V97 = "application/vnd.lotus-1-2-3;version=97+9.x"
  val ThreeMf = "application/vnd.ms-package.3dmanufacturing-3dmodel+xml"
  val Dbf = "application/x-dbf"
  val DifXml = "application/dif+xml"
  val Mif = "application/vnd.mif"
  val Afm = "application/x-font-adobe-metric"
  val AppleSingle = "application/applefile"
  val Prt = "application/x-prt"
  val Tmx = "application/x-tmx"
  val Xliff = "application/x-xliff+xml"
  val Xlz = "application/x-xliff+zip"
  val FictionBook = "application/x-fictionbook+xml"
  val Idml = "application/vnd.adobe.indesign-idml-package"
  val Ac3 = "audio/ac3"
  val Dpx = "image/x-dpx"
  val Nitf = "image/nitf"
  val E57 = "model/e57"
  val Zim = "application/x-zim"
  val BerkeleyDb = "application/x-berkeley-db"
  val Diff = "text/x-diff"
  val Pkcs7Mime = "application/pkcs7-mime"
  val Pkcs7Sig = "application/pkcs7-signature"
  val Tsd = "application/timestamped-data"
  // round-4 parity tranche (tika-mimetypes.xml entries for fixtures that
  // previously fell to octet-stream)
  val PgpEncrypted = "application/pgp-encrypted"
  val AxCrypt = "application/x-axcrypt"
  val Indd = "application/x-adobe-indesign"
  val BdbHash = "application/x-berkeley-db;format=hash"
  val BdbBtree = "application/x-berkeley-db;format=btree"
  val MySqlDb = "application/x-mysql-db"
  val MySqlFrm = "application/x-mysql-table-definition"
  val MySqlMyisamIdx = "application/x-mysql-misam-index"
  val MySqlMyisamCIdx = "application/x-mysql-misam-compressed-index"
  val MySqlMyisamData = "application/x-mysql-misam-data"
  val SasV6 = "application/x-sas-data-v6"
  val QpwDos14 = "application/x-quattro-pro;version=1-4"
  val QpwDos5 = "application/x-quattro-pro;version=5"
  val QpwWin15 = "application/x-quattro-pro;version=1+5"
  val QpwWin6 = "application/x-quattro-pro;version=6"
  val Os2Bga = "image/x-os2-graphics; charset=binary"
  val Dgn = "image/vnd.dgn"
  val Dgn7 = "image/vnd.dgn;version=7"
  val Dcx = "image/vnd.zbrush.dcx"
  val Jbig2 = "image/x-jbig2"
  val HprofBin = "application/vnd.java.hprof"
  val HprofText = "application/vnd.java.hprof.text"
  val Wp42 = "application/vnd.wordperfect;version=4.2"
  val ErdasHfa = "application/x-erdas-hfa"
  val Brotli = "application/x-brotli"
  val Pack200 = "application/x-java-pack200"

  val magics: Vector[Magic] = Vector(
    // MHTML (higher priority than message/rfc822's MIME-Version magic;
    // tika-mimetypes.xml:7502-7508)
    Magic(MhtRelated, 60, OrClause(Seq(
      AndClause(Seq(string(0, "MIME-Version: 1.0"),
        stringRange(16, 512, "\nContent-Type: multipart/related"))),
      istring(0, "From: <Saved by Windows Internet Explorer 8>"),
      istring(0, "From: \"Saved by Internet Explorer 11\"")
    ))),
    // ---- archives & compressors
    Magic(Tar, 40, BytesClause(257, 257, ascii("ustar") :+ 0.toByte)),
    Magic(Gtar, 50, BytesClause(257, 257, ascii("ustar  ") :+ 0.toByte)),
    Magic(SevenZ, 50, AndClause(Seq(string(0, "7z"),
      bytes(2, 0xbc, 0xaf, 0x27, 0x1c)))),
    // .one section file: header guidFileType {7B5C52E4-D88C-4DA7-AEB1-
    // 5378D02996D3} serialized little-endian (MS-ONESTORE §2.3.1)
    Magic(OneNote, 50, bytes(0, 0xe4, 0x52, 0x5c, 0x7b, 0x8c, 0xd8,
      0xa7, 0x4d, 0xae, 0xb1, 0x53, 0x78, 0xd0, 0x29, 0x96, 0xd3)),
    Magic(Rar, 50, bytes(0, 'R', 'a', 'r', '!', 0x1a)),
    Magic(Bzip2, 40, RegexClause("^BZh[1-9]", window = 8)),
    Magic(Xz, 50, bytes(0, 0xfd, '7', 'z', 'X', 'Z', 0x00)),
    Magic(Zstd, 50, little32(0, 0xFD2FB528L)),
    Magic(Lz4, 60, OrClause(Seq(little32(0, 0x184D2204L), little32(0, 0x184C2102L)))),
    Magic(Cab, 50, bytes(0, 'M', 'S', 'C', 'F', 0, 0, 0, 0)),
    Magic(Ar, 50, string(0, "!<arch>\n")),
    Magic(Deb, 60, string(0, "!<arch>\ndebian-binary")),
    Magic(Cpio, 50, OrClause(Seq(
      little16(0, 0x71C7), big16(0, 0x71C7), // 070707 octal
      string(0, "070707"), string(0, "070701"), string(0, "070702")))),
    Magic(Rpm, 50, bytes(0, 0xed, 0xab, 0xee, 0xdb)),
    // BSD dump(8): c_magic NFS_MAGIC 60012 at spcl offset 24 with a
    // TS_TAPE first segment (tika: x-tika-unix-dump via commons-compress)
    Magic(UnixDump, 50, AndClause(Seq(
      little32(24, 60012L), little32(0, 1L)))),
    Magic(Iso, 60, OrClause(Seq(
      string(32769, "CD001"), string(34817, "CD001"), string(36865, "CD001")))),
    Magic(Lzip, 50, string(0, "LZIP")),
    Magic(Warc, 60, string(0, "WARC/")),
    // ---- images
    Magic(Ico, 50, bytes(0, 0, 0, 1, 0)),
    Magic(Psd, 50, OrClause(Seq(
      BytesClause(0, 0, ascii("8BPS") :+ 0.toByte :+ 1.toByte),
      BytesClause(0, 0, ascii("8BPS") :+ 0.toByte :+ 2.toByte)))),
    Magic(Heic, 60, OrClause(Seq(string(4, "ftypheic"), string(4, "ftypheix")))),
    Magic(Avif, 60, string(4, "ftypavif")),
    Magic(Jp2, 50, bytes(0, 0x00, 0x00, 0x00, 0x0c, 0x6a, 0x50, 0x20, 0x20,
      0x0d, 0x0a, 0x87, 0x0a)),
    Magic(Xcf, 50, string(0, "gimp xcf ")),
    // ---- audio / video
    Magic(Flac, 50, string(0, "fLaC")),
    Magic(Midi, 20, string(0, "MThd")),
    Magic(M4a, 60, OrClause(Seq(string(4, "ftypM4A "), string(4, "ftypM4B "),
      string(4, "ftypF4A "), string(4, "ftypF4B ")))),
    Magic(M4v, 50, OrClause(Seq(string(4, "ftypM4V "), string(4, "ftypM4VH"),
      string(4, "ftypM4VP")))),
    Magic(Flv, 50, string(0, "FLV")),
    Magic(MpegVideo, 50, OrClause(Seq(
      bytes(0, 0x00, 0x00, 0x01, 0xb3), bytes(0, 0x00, 0x00, 0x01, 0xba)))),
    Magic(QuickTime, 50, OrClause(Seq(
      BytesClause(4, 4, ascii("moov") :+ 0.toByte),
      BytesClause(4, 4, ascii("mdat") :+ 0.toByte),
      BytesClause(4, 4, ascii("free") :+ 0.toByte),
      BytesClause(4, 4, ascii("skip") :+ 0.toByte)))),
    // ---- fonts
    Magic(Ttf, 40, bytes(0, 0x00, 0x01, 0x00, 0x00)),
    Magic(Otf, 50, BytesClause(0, 0, ascii("OTTO") :+ 0.toByte)),
    // ---- executables / bytecode / data formats
    Magic(JavaClass, 50, bytes(0, 0xca, 0xfe, 0xba, 0xbe)),
    Magic(Wasm, 50, OrClause(Seq(little32(0, 0x6d736100L), big32(0, 0x6d736100L)))),
    Magic(Elf, 50, bytes(0, 0x7f, 'E', 'L', 'F')),
    Magic(ElfExe, 50, AndClause(Seq(bytes(0, 0x7f, 'E', 'L', 'F'),
      OrClause(Seq(little16(16, 2), big16(16, 2)))))),
    Magic(ElfLib, 50, AndClause(Seq(bytes(0, 0x7f, 'E', 'L', 'F'),
      OrClause(Seq(little16(16, 3), big16(16, 3)))))),
    Magic(ElfObj, 50, AndClause(Seq(bytes(0, 0x7f, 'E', 'L', 'F'),
      OrClause(Seq(little16(16, 1), big16(16, 1)))))),
    Magic(ElfCore, 50, AndClause(Seq(bytes(0, 0x7f, 'E', 'L', 'F'),
      OrClause(Seq(little16(16, 4), big16(16, 4)))))),
    Magic(MsExe, 50, string(0, "MZ")),
    Magic(Swf, 50, OrClause(Seq(string(0, "FWS"), string(0, "CWS")))),
    Magic(Sqlite, 50, BytesClause(0, 0, ascii("SQLite format 3") :+ 0.toByte)),
    Magic(Parquet, 50, string(0, "PAR1")),
    Magic(Hdf, 50, OrClause(Seq(big32(0, 0x0e031301L),
      bytes(0, 0x89, 'H', 'D', 'F', 0x0d, 0x0a, 0x1a)))),
    Magic(Matlab, 50, string(0, "MATLAB")),
    Magic(MsAccess, 50, bytes(0, 0x00, 0x01, 0x00, 0x00, 'S', 't', 'a', 'n')),
    Magic(MsWrite, 50, OrClause(Seq(big32(0, 0x31be0000L), big32(0, 0x32be0000L)))),
    Magic(PostScript, 50, OrClause(Seq(
      string(0, "%!"), bytes(0, 0xc5, 0xd0, 0xd3, 0xc6)))),
    Magic(Mobi, 60, stringRange(0, 60, "BOOKMOBI")),
    Magic(Icc, 50, string(36, "acsp")),
    // ---- scripts / structured text (all text/plain subtypes)
    Magic(Python, 50, OrClause(Seq(
      string(0, "#!/bin/python"), string(0, "#! /bin/python"),
      string(0, "#!/usr/bin/python"), string(0, "#! /usr/bin/python")))),
    Magic(Sh, 50, OrClause(Seq(
      string(0, "#!/"), string(0, "#! /"), string(0, "#!\t/"),
      string(0, "eval \"exec")))),
    Magic(CSrc, 50, string(0, "#include ")),
    // ---- round-3 breadth tranche (all transcribed from the reference
    // tika-mimetypes.xml blocks for these types)
    Magic(Woff, 50, string(0, "wOFF")),
    Magic(Woff2, 50, string(0, "wOF2")),
    Magic(Chm, 50, string(0, "ITSF")),
    Magic(Djvu, 50, string(0, "AT&TFORM")),
    Magic(Aiff, 50, AndClause(Seq(string(0, "FORM"), OrClause(Seq(
      string(8, "AIFF"), string(8, "AIFC"), string(8, "8SVX")))))),
    Magic(AuBasic, 50, string(0, ".snd")),
    Magic(Amr, 50, string(0, "#!AMR")),
    Magic(MachO, 50, OrClause(Seq(
      bytes(0, 0xfe, 0xed, 0xfa, 0xce), bytes(0, 0xce, 0xfa, 0xed, 0xfe),
      bytes(0, 0xfe, 0xed, 0xfa, 0xcf), bytes(0, 0xcf, 0xfa, 0xed, 0xfe)))),
    // fat header: CAFEBABE + small big-endian arch count disambiguates
    // from java-vm class files (whose bytes 4-7 are minor<<16|major >= 45)
    Magic(MachOFat, 60, AndClause(Seq(bytes(0, 0xca, 0xfe, 0xba, 0xbe),
      OrClause((1 to 6).map(n => big32(4, n.toLong)))))),
    Magic(Dex, 50, AndClause(Seq(string(0, "dex\n"), bytes(7, 0)))),
    Magic(Exr, 50, bytes(0, 0x76, 0x2f, 0x31, 0x01)),
    Magic(Pbm, 50, RegexClause("^P[14][\\x0a\\x0d\\x20]", window = 4)),
    Magic(Pgm, 50, RegexClause("^P[25][\\x0a\\x0d\\x20]", window = 4)),
    Magic(Ppm, 50, RegexClause("^P[36][\\x0a\\x0d\\x20]", window = 4)),
    Magic(Pcx, 50, AndClause(Seq(bytes(0, 0x0a), OrClause(Seq(
      bytes(1, 0), bytes(1, 2), bytes(1, 3), bytes(1, 4), bytes(1, 5)))))),
    Magic(Pcap, 50, OrClause(Seq(
      big32(0, 0xa1b2c3d4L), big32(0, 0xd4c3b2a1L),
      big32(0, 0xa1b23c4dL), big32(0, 0x4d3cb2a1L)))),
    Magic(Pcapng, 50, AndClause(Seq(bytes(0, 0x0a, 0x0d, 0x0d, 0x0a),
      OrClause(Seq(big32(8, 0xa1b2c3d4L), little32(8, 0xa1b2c3d4L)))))),
    Magic(Wpd, 50, big32(0, 0xFF575043L)),
    // WP 4.2 pre-dates the WPC prefix (tika-mimetypes.xml:3229); the
    // reference detects it but its WordPerfectParser takes only 5.x/6.x
    Magic(Wp42, 50, AndClause(Seq(
      bytes(0, 0xcb, 0x0a, 0x01), bytes(5, 0xcb)))),
    Magic(Afm, 50, string(0, "StartFontMetrics")),
    Magic(AppleSingle, 50, bytes(0, 0x00, 0x05, 0x16, 0x00)),
    Magic(Prt, 50, string(8, "0M3C")),
    Magic(Mif, 50, OrClause(Seq(string(0, "<MIFFile"), string(0, "<MakerFile"),
      string(0, "<MakerDictionary"), string(0, "<MakerScreenFont"),
      string(0, "<MML"), string(0, "<Book")))),
    Magic(SquashFs, 50, OrClause(Seq(string(0, "hsqs"), string(0, "sqsh")))),
    Magic(XarArchive, 50, string(0, "xar!")),
    Magic(Torrent, 50, string(0, "d8:announce")),
    Magic(Jxl, 50, OrClause(Seq(bytes(0, 0xff, 0x0a),
      bytes(0, 0x00, 0x00, 0x00, 0x0c, 0x4a, 0x58, 0x4c, 0x20,
        0x0d, 0x0a, 0x87, 0x0a)))),
    Magic(Crx, 50, string(0, "Cr24")),
    Magic(Avi2, 50, AndClause(Seq(string(0, "RIFF"), string(8, "AVI ")))),
    Magic(RealMedia, 50, string(0, ".RMF")),
    Magic(Lha, 50, OrClause(Seq(
      string(2, "-lh0-"), string(2, "-lh1-"), string(2, "-lh2-"),
      string(2, "-lh4-"), string(2, "-lh5-"), string(2, "-lhd-"),
      string(2, "-lzs-")))),
    Magic(Arj, 50, bytes(0, 0x60, 0xea)),
    // zlib's 2-byte header is weak — low priority like the reference's
    Magic(Zlib, 20, OrClause(Seq(
      bytes(0, 0x78, 0x01), bytes(0, 0x78, 0x5e),
      bytes(0, 0x78, 0x9c), bytes(0, 0x78, 0xda)))),
    Magic(SnappyFramed, 50, string(4, "sNaPpY")),
    Magic(Netcdf, 50, OrClause(Seq(
      AndClause(Seq(string(0, "CDF"), bytes(3, 1))),
      AndClause(Seq(string(0, "CDF"), bytes(3, 2))),
      AndClause(Seq(string(0, "CDF"), bytes(3, 5)))))), // CDF-5 (pnetcdf)
    Magic(Grib, 50, string(0, "GRIB")),
    Magic(Fits, 50, string(0, "SIMPLE  =")),
    Magic(Dicom, 50, string(128, "DICM")),
    Magic(Wmf, 50, OrClause(Seq(
      bytes(0, 0xd7, 0xcd, 0xc6, 0x9a, 0x00, 0x00),
      bytes(0, 0x01, 0x00, 0x09, 0x00, 0x00, 0x03)))),
    Magic(Emf, 50, little32(40, 0x464D4520L)),
    Magic(Anpa, 50, bytes(0, 0x16, 0x16, 0x01)),
    Magic(Ics, 50, AndClause(Seq(string(0, "BEGIN:VCALENDAR"),
      stringRange(15, 360, "\nVERSION:2.0")))),
    Magic(VCard, 50, string(0, "BEGIN:VCARD")),
    // MSOffice owner/lock temp file: length byte repeats at offset 53+1
    // (tika-mimetypes.xml:4640-4649, PRONOM fmt-473)
    Magic(MsOwner, 80, RegexClause(
      "(?s)^([\\x05-\\x0F])[\\x00\\x20-\\x7E]{10}.{43}\\1\\x00",
      window = 60, ignoreCase = false)),

    // ---- round-3 second tranche (signatures transcribed from the
    // reference's tika-mimetypes.xml match elements)
    // Ogg container + codec-specialized subtypes: the first logical
    // packet's codec marker sits at offset 28 (page header is 28 bytes);
    // codec magics outrank the bare container magic
    Magic(OggVorbis, 60, AndClause(Seq(string(0, "OggS"),
      bytes(28, 0x01), string(29, "vorbis")))),
    Magic(OggOpus, 60, AndClause(Seq(string(0, "OggS"),
      string(28, "OpusHead")))),
    Magic(OggTheora, 60, AndClause(Seq(string(0, "OggS"),
      bytes(28, 0x80), string(29, "theora")))),
    Magic(OggSpeex, 60, AndClause(Seq(string(0, "OggS"),
      string(28, "Speex   ")))),
    Magic(OggFlacA, 60, AndClause(Seq(string(0, "OggS"),
      bytes(28, 0x7f), string(29, "FLAC")))),
    Magic(Asf, 50, big32(0, 0x3026b275L)),
    Magic(Pst, 50, AndClause(Seq(string(0, "!BDN"), string(8, "SM")))),
    Magic(Tnef, 50, little32(0, 0x223e9f78L)),
    Magic(PemCert, 50, string(0, "-----BEGIN CERTIFICATE-----")),
    Magic(UnixCompress, 50, bytes(0, 0x1f, 0x9d)),
    Magic(Dvi, 50, little16(0, 0x02f7)),
    Magic(Type1Font, 50, OrClause(Seq(
      string(0, "%!PS-AdobeFont-1.0"),
      AndClause(Seq(bytes(0, 0x80, 0x01), string(6, "%!PS-AdobeFont")))))),
    Magic(BPlist, 50, string(0, "bplist0")),
    Magic(Eot, 50, AndClause(Seq(bytes(8, 0x02, 0x00, 0x02, 0x00),
      bytes(34, 0x4c, 0x50)))),
    Magic(BinHex, 50, string(11, "must be converted with BinHex")),
    Magic(ArcArchive, 50, string(0, "filedesc://")),
    // outranks the body's own type (e.g. an html payload): the head IS
    // the framing, like the reference's x-httpresponse priority
    Magic(HttpResponse, 70, AndClause(Seq(string(0, "HTTP/1."),
      RegexClause("\\n(Content-Type|Content-Length|Cache-Control):",
        window = 1000)))),
    Magic(Icns, 50, string(0, "icns")),
    Magic(Bpg, 50, bytes(0, 0x42, 0x50, 0x47, 0xfb)),
    Magic(Pam, 50, AndClause(Seq(string(0, "P7"), OrClause(Seq(
      bytes(2, 0x0a), bytes(2, 0x0d), bytes(2, 0x20)))))),
    Magic(SgiRgb, 50, bytes(0, 0x01, 0xda, 0x01, 0x01, 0x00, 0x03)),
    // CR2 = TIFF header + "CR" marker at 8; outranks the plain TIFF magic
    Magic(CanonCr2, 60, OrClause(Seq(
      AndClause(Seq(bytes(0, 0x49, 0x49, 0x2a, 0x00), string(8, "CR"))),
      AndClause(Seq(bytes(0, 0x4d, 0x4d, 0x00, 0x2a), string(8, "CR")))))),
    Magic(Mng, 50, AndClause(Seq(bytes(0, 0x8a), string(1, "MNG")))),
    Magic(Jng, 50, AndClause(Seq(bytes(0, 0x8b), string(1, "JNG")))),
    Magic(Caf, 50, AndClause(Seq(string(0, "caff"), bytes(4, 0x00)))),
    Magic(AmrWb, 60, string(0, "#!AMR-WB")),
    Magic(Sid, 50, string(0, "PSID")),
    Magic(RealAudio, 50, big32(0, 0x2e7261fdL)),
    Magic(Vtt, 50, OrClause(Seq(string(0, "WEBVTT\r"), string(0, "WEBVTT\n")))),
    Magic(Dwf, 50, string(0, "(DWF V")),
    Magic(Dwg, 50, OrClause(Seq(string(0, "AC10"), string(0, "AC1."),
      string(0, "MC0.0")))),
    Magic(NesRom, 50, bytes(0, 0x4e, 0x45, 0x53, 0x1a)),
    Magic(Zoo, 50, little32(20, 0xfdc4a7dcL)),
    Magic(StuffIt, 50, OrClause(Seq(string(0, "StuffIt"), string(0, "SIT!")))),
    Magic(Shapefile, 50, big32(0, 0x0000270aL)),
    Magic(SasData, 50, string(84, "SAS FILE")),
    Magic(EnviHdr, 50, OrClause(Seq(string(0, "ENVI\n"), string(0, "ENVI\r")))),
    // tika-mimetypes.xml:3394 — "ActiveMime" + two NULs
    Magic(ActiveMime, 60, BytesClause(0, 0,
      "ActiveMime".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
        ++ Array[Byte](0, 0))),
    Magic(SpssSav, 50, string(0, "$FL2@(#)")),
    Magic(StataDta, 50, string(0, "<stata_dta>")),
    Magic(Jks, 50, big32(0, 0xfeedfeedL)),
    Magic(Hwp, 50, string(0, "HWP Document File V")),
    Magic(Ac3, 30, bytes(0, 0x0b, 0x77)), // 2-byte sync word — low priority
    Magic(Dpx, 50, OrClause(Seq(string(0, "SDPX"), string(0, "XPDS")))),
    Magic(Nitf, 50, string(0, "NITF0")),
    Magic(E57, 50, string(0, "ASTM-E57")),
    Magic(Zim, 50, bytes(0, 0x5a, 0x49, 0x4d, 0x04)),
    Magic(BdbBtree, 50, OrClause(Seq(
      little32(12, 0x00053162L), big32(12, 0x00053162L),
      little32(0, 0x00053162L), big32(0, 0x00053162L)))),
    Magic(BdbHash, 50, OrClause(Seq(
      little32(12, 0x00061561L), big32(12, 0x00061561L),
      little32(0, 0x00061561L), big32(0, 0x00061561L)))),
    Magic(Diff, 30, OrClause(Seq(string(0, "diff "), string(0, "Only in "),
      string(0, "Index:"), string(0, "*** ")))),
    // CMS content types in the 1.2.840.113549.1.9.16.1.* arc with the
    // final OID byte masked (compressedData .9, authData .2, ...);
    // offset range 2..6 spans the DER SEQUENCE length forms. The exact
    // .31 OID (timestamped-data) outranks this at priority 60.
    Magic(Pkcs7Mime, 50, AndClause(Seq(bytes(0, 0x30), BytesClause(2, 6,
      Array(0x06, 0x0b, 0x2a, 0x86, 0x48, 0x86, 0xf7, 0x0d, 0x01,
        0x09, 0x10, 0x01, 0x00).map(_.toByte),
      mask = (Array.fill(12)(0xff) :+ 0x00).map(_.toByte))))),
    // the whole .7 arc (signedData .2, envelopedData .3, digestedData
    // .5, encryptedData .6 — last OID byte masked, then the [0] content
    // tag) detects coarsely as pkcs7-signature like the reference
    // (tika-mimetypes.xml pkcs7-signature block + Pkcs7DetectionTest:
    // signed/enveloped/digested all land here; the parser refines the
    // smime-type), plus the PEM form
    Magic(Pkcs7Sig, 50, OrClause(Seq(
      string(0, "-----BEGIN PKCS7"),
      AndClause(Seq(bytes(0, 0x30), BytesClause(2, 6,
        Array(0x06, 0x09, 0x2a, 0x86, 0x48, 0x86, 0xf7, 0x0d, 0x01,
          0x07, 0x00, 0xa0).map(_.toByte),
        mask = (Array.fill(10)(0xff) ++ Array(0x00, 0xff)).map(_.toByte))))))),
    Magic(Tsd, 60, AndClause(Seq(bytes(0, 0x30), BytesClause(2, 6,
      Array(0x06, 0x0b, 0x2a, 0x86, 0x48, 0x86, 0xf7, 0x0d, 0x01,
        0x09, 0x10, 0x01, 0x1f).map(_.toByte))))),
    // pre-OLE2 raw-BIFF Excel sheets (BOF record + its length field;
    // tika types vnd.ms-excel.sheet.2/3/4 — routed to the xls extractor)
    Magic(MediaTypes.MsExcel, 50, OrClause(Seq(
      bytes(0, 0x09, 0x04, 0x06, 0x00), // BIFF4 BOF
      bytes(0, 0x09, 0x02, 0x06, 0x00), // BIFF3 BOF
      bytes(0, 0x09, 0x00, 0x04, 0x00)))), // BIFF2 BOF
    // Lotus 1-2-3 worksheet BOF records, one versioned magic each
    // (tika-mimetypes.xml:1851-1901)
    Magic(Lotus123V1, 50, bytes(0, 0x00, 0x00, 0x02, 0x00, 0x04, 0x04)),
    Magic(Lotus123V2, 50, bytes(0, 0x00, 0x00, 0x02, 0x00, 0x06, 0x04,
      0x06, 0x00, 0x08, 0x00)),
    Magic(Lotus123V3, 50, bytes(0, 0x00, 0x00, 0x1a, 0x00, 0x00, 0x10, 0x04, 0x00)),
    Magic(Lotus123V4, 50, bytes(0, 0x00, 0x00, 0x1a, 0x00, 0x02, 0x10, 0x04, 0x00)),
    Magic(Lotus123V97, 50, bytes(0, 0x00, 0x00, 0x1a, 0x00, 0x03, 0x10, 0x04, 0x00)),
    // round-4 parity tranche — magic semantics re-expressed from
    // tika-mimetypes.xml (pgp-encrypted, x-axcrypt, x-adobe-indesign,
    // mysql family, x-sas-data-v6, quattro-pro DOS/Win versions,
    // x-os2-graphics, vnd.dgn;version=7, zbrush.dcx, x-jbig2,
    // vnd.java.hprof[.text], x-erdas-hfa)
    Magic(PgpEncrypted, 50, AndClause(Seq(bytes(0, 0x85), bytes(3, 0x03)))),
    Magic(AxCrypt, 60, AndClause(Seq(
      bytes(0, 0xc0, 0xb9, 0x07, 0x2e, 0x4f, 0x93, 0xf1, 0x46, 0xa0,
        0x15, 0x79, 0x2c, 0xa1, 0xd9, 0xe8, 0x21),
      big32(17, 2L)))),
    Magic(Indd, 50, bytes(0, 0x06, 0x06, 0xed, 0xf5, 0xd8, 0x1d, 0x46,
      0xe5, 0xbd, 0x31, 0xef, 0xe7, 0xfe, 0x74, 0xb7, 0x1d)),
    Magic(MySqlFrm, 40, OrClause((0x07 to 0x0c).map(v =>
      bytes(0, 0xfe, 0x01, v)))),
    Magic(MySqlMyisamIdx, 40, OrClause(Seq(
      bytes(0, 0xfe, 0xfe, 0x03), bytes(0, 0xfe, 0xfe, 0x05)))),
    Magic(MySqlMyisamCIdx, 40, OrClause(Seq(
      bytes(0, 0xfe, 0xfe, 0x06), bytes(0, 0xfe, 0xfe, 0x07)))),
    Magic(SasV6, 40, OrClause(Seq(
      string(0, "SAS     6."), string(0, "SAS     7."),
      string(0, "SAS     8.0"), string(0, "SAS     9.0")))),
    Magic(QpwDos14, 50, bytes(0, 0x00, 0x00, 0x02, 0x00, 0x20, 0x51)),
    Magic(QpwDos5, 50, bytes(0, 0x00, 0x00, 0x02, 0x00, 0x21, 0x51)),
    Magic(QpwWin15, 50, bytes(0, 0x00, 0x00, 0x02, 0x00, 0x01, 0x10)),
    Magic(QpwWin6, 50, bytes(0, 0x00, 0x00, 0x02, 0x00, 0x02, 0x10)),
    Magic(Os2Bga, 50, AndClause(Seq(string(0, "BA"), OrClause(Seq(
      string(14, "BM"), string(14, "CI"), string(14, "IC"),
      string(14, "CP"), string(14, "PT")))))),
    // v7 DGN: first byte 0x08 or 0xC8 (high nibble masked), then 09 FE 02
    Magic(Dgn7, 50, BytesClause(0, 0,
      Array(0x08, 0x09, 0xfe, 0x02).map(_.toByte),
      mask = Array(0x0f, 0xff, 0xff, 0xff).map(_.toByte))),
    Magic(Dcx, 50, bytes(0, 0xb1, 0x68, 0xde, 0x3a)),
    Magic(Jbig2, 50, bytes(0, 0x97, 0x4a, 0x42, 0x32, 0x0d, 0x0a, 0x1a, 0x0a)),
    Magic(HprofBin, 50, RegexClause(
      "^JAVA PROFILE \\d\\.\\d\\.\\d\\x00", window = 32)),
    Magic(HprofText, 50, RegexClause(
      "^JAVA PROFILE \\d\\.\\d\\.\\d,", window = 32)),
    Magic(ErdasHfa, 50, string(0, "EHFA_HEADER_TAG"))
  )

  /** sub-class-of edges for the added types (text/x-* get text/plain via
    * the prefix heuristic and need no edge).
    */
  val superTypes: Map[String, String] = Map(
    Lotus123V1 -> Lotus123, Lotus123V2 -> Lotus123, Lotus123V3 -> Lotus123,
    Lotus123V4 -> Lotus123, Lotus123V97 -> Lotus123,
    BdbHash -> BerkeleyDb, BdbBtree -> BerkeleyDb,
    MySqlFrm -> MySqlDb, MySqlMyisamIdx -> MySqlDb,
    MySqlMyisamCIdx -> MySqlDb, MySqlMyisamData -> MySqlDb,
    QpwDos14 -> Qpw, QpwDos5 -> Qpw, QpwWin15 -> Qpw, QpwWin6 -> Qpw,
    Dgn7 -> Dgn,
    Wp42 -> Wpd,
    HprofText -> MediaTypes.TextPlain,
    ThreeMf -> MediaTypes.Zip,
    Gtar -> Tar,
    Deb -> Ar,
    Wacz -> DataPackageZip, DataPackageZip -> MediaTypes.Zip,
    MhtRelated -> MediaTypes.Eml,
    VBasic -> MediaTypes.TextPlain, Basic -> MediaTypes.TextPlain,
    FlatOd -> MediaTypes.Xml, FlatOdt -> FlatOd, FlatOds -> FlatOd,
    FlatOdp -> FlatOd, Word2006Ml -> MediaTypes.Xml, Opf -> MediaTypes.Xml,
    "application/vnd.apple.keynote.13" -> "application/vnd.apple.unknown.13",
    "application/vnd.apple.numbers.13" -> "application/vnd.apple.unknown.13",
    "application/vnd.apple.pages.13" -> "application/vnd.apple.unknown.13",
    "application/vnd.apple.unknown.13" -> MediaTypes.Zip,
    ElfExe -> Elf, ElfLib -> Elf, ElfObj -> Elf, ElfCore -> Elf,
    M4a -> "video/mp4",
    M4v -> "video/mp4",
    WebmVideo -> "video/x-matroska",
    Heic -> "video/mp4", Avif -> "video/mp4", // ftyp-box ISOBMFF family
    Sh -> MediaTypes.TextPlain,
    Ics -> MediaTypes.TextPlain,
    VCard -> MediaTypes.TextPlain,
    Json -> MediaTypes.TextPlain,
    "application/javascript" -> MediaTypes.TextPlain,
    "application/x-sql" -> MediaTypes.TextPlain,
    "application/java-archive" -> MediaTypes.Zip,
    Bzip2 -> "application/x-bzip",
    // round-3 second tranche
    OggVorbis -> MediaTypes.Ogg, OggOpus -> MediaTypes.Ogg,
    OggTheora -> MediaTypes.Ogg, OggSpeex -> MediaTypes.Ogg,
    OggFlacA -> MediaTypes.Ogg,
    CanonCr2 -> MediaTypes.Tiff,
    Vtt -> MediaTypes.TextPlain,
    Diff -> MediaTypes.TextPlain,
    PemCert -> MediaTypes.TextPlain,
    HttpResponse -> MediaTypes.TextPlain,
    // iWork packages are zips; member recursion extracts their XML
    "application/vnd.apple.pages" -> MediaTypes.Zip,
    "application/vnd.apple.numbers" -> MediaTypes.Zip,
    "application/vnd.apple.keynote" -> MediaTypes.Zip
  )

  /** Exact-name glob tier (mime/Patterns.java:40-162; all 10 non-wildcard
    * globs in the reference DB).
    */
  val exactNames: Map[String, String] = Map(
    "Makefile" -> "text/x-makefile",
    "GNUMakefile" -> "text/x-makefile",
    "INSTALL" -> MediaTypes.TextPlain,
    "KEYS" -> MediaTypes.TextPlain,
    "LICENSE" -> MediaTypes.TextPlain,
    "NOTICE" -> MediaTypes.TextPlain,
    "README" -> MediaTypes.TextPlain,
    "abs-linkmap" -> MediaTypes.TextPlain,
    "abs-menulinks" -> MediaTypes.TextPlain,
    ".htaccess" -> MediaTypes.TextPlain
  )

  /** Regex glob tier (both regex globs in the reference DB). */
  val regexGlobs: Seq[(java.util.regex.Pattern, String)] = Seq(
    java.util.regex.Pattern.compile("^rdf$") -> "application/rdf+xml",
    java.util.regex.Pattern.compile("^owl$") -> "application/rdf+xml"
  )

  /** Extension tier: the 782-entry table generated from the reference's
    * detection suite, overridden by the curated core on conflicts.
    */
  def extGlobs: Map[String, String] = MimeDbGlobs.pairs
}
