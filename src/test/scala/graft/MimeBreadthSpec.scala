package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.mime.{MimeDb, MimeRegistry}
import graft.mime.{MediaTypes => MT}

/** Round-2 registry breadth: numeric magic value types, the widened
  * magic set, and the three-tier glob index (exact name / extension /
  * regex) ported from the reference database.
  */
class MimeBreadthSpec extends AnyFunSuite {

  private def det(bytes: Array[Byte]): String = MimeRegistry.detect(bytes, None)
  private def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
  private def s(str: String): Array[Byte] =
    str.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)

  test("archive and compressor magics") {
    val tar = new Array[Byte](512)
    System.arraycopy(s("ustar"), 0, tar, 257, 5) // NUL-terminated by the zero fill
    assert(det(tar) == MimeDb.Tar)
    val gtar = new Array[Byte](512)
    System.arraycopy(s("ustar  "), 0, gtar, 257, 7)
    assert(det(gtar) == MimeDb.Gtar)
    assert(det(s("7z") ++ b(0xbc, 0xaf, 0x27, 0x1c)) == MimeDb.SevenZ)
    assert(det(s("Rar!") ++ b(0x1a, 0x07)) == MimeDb.Rar)
    assert(det(s("BZh9") ++ b(0x31)) == MimeDb.Bzip2)
    assert(det(b(0xfd) ++ s("7zXZ") ++ b(0)) == MimeDb.Xz)
    assert(det(b(0x28, 0xb5, 0x2f, 0xfd, 1, 2)) == MimeDb.Zstd)   // little32
    assert(det(b(0x04, 0x22, 0x4d, 0x18, 9)) == MimeDb.Lz4)       // little32
    assert(det(s("MSCF") ++ b(0, 0, 0, 0, 1)) == MimeDb.Cab)
    assert(det(s("!<arch>\ngnu.o")) == MimeDb.Ar)
    assert(det(s("!<arch>\ndebian-binary ")) == MimeDb.Deb) // specialization
    assert(det(b(0xc7, 0x71, 5, 5)) == MimeDb.Cpio)               // little16
    assert(det(b(0x71, 0xc7, 5, 5)) == MimeDb.Cpio)               // big16
    assert(det(b(0xed, 0xab, 0xee, 0xdb)) == MimeDb.Rpm)
    val iso = new Array[Byte](32780)
    System.arraycopy(s("CD001"), 0, iso, 32769, 5)
    assert(det(iso) == MimeDb.Iso)
    assert(det(s("WARC/1.0\r\n")) == MimeDb.Warc)
  }

  test("image, audio, video magics") {
    assert(det(b(0, 0, 1, 0, 4, 0)) == MimeDb.Ico)
    assert(det(s("8BPS") ++ b(0, 1, 0)) == MimeDb.Psd)
    assert(det(b(0, 0, 0, 24) ++ s("ftypheic")) == MimeDb.Heic)
    assert(det(b(0, 0, 0, 24) ++ s("ftypavif")) == MimeDb.Avif)
    assert(det(b(0, 0, 0, 0x0c, 0x6a, 0x50, 0x20, 0x20, 0x0d, 0x0a, 0x87, 0x0a))
      == MimeDb.Jp2)
    assert(det(s("gimp xcf v011")) == MimeDb.Xcf)
    assert(det(s("fLaC") ++ b(0)) == MimeDb.Flac)
    assert(det(s("MThd") ++ b(0, 0, 0, 6)) == MimeDb.Midi)
    assert(det(b(0, 0, 0, 24) ++ s("ftypM4A ")) == MimeDb.M4a) // beats mp4 @p50
    assert(det(b(0, 0, 0, 24) ++ s("ftypmp42")) == MT.Mp4)     // generic ftyp stays mp4
    assert(det(b(0, 0, 0, 24) ++ s("moov") ++ b(0)) == MimeDb.QuickTime)
    assert(det(s("FLV") ++ b(1)) == MimeDb.Flv)
    assert(det(b(0, 0, 1, 0xb3, 7)) == MimeDb.MpegVideo)
  }

  test("executable / bytecode / data magics incl. numeric types") {
    assert(det(b(0xca, 0xfe, 0xba, 0xbe, 0, 0)) == MimeDb.JavaClass)
    assert(det(b(0x00, 0x61, 0x73, 0x6d, 1, 0, 0, 0)) == MimeDb.Wasm)
    val elfExe = b(0x7f) ++ s("ELF") ++ new Array[Byte](12) ++ b(0x02, 0x00)
    assert(det(elfExe) == MimeDb.ElfExe) // e_type little16 @16 specializes ELF
    val elfLib = b(0x7f) ++ s("ELF") ++ new Array[Byte](12) ++ b(0x03, 0x00)
    assert(det(elfLib) == MimeDb.ElfLib)
    val elfPlain = b(0x7f) ++ s("ELF") ++ new Array[Byte](12) ++ b(0x63, 0x63)
    assert(det(elfPlain) == MimeDb.Elf)
    assert(det(s("MZ") ++ b(0x90, 0)) == MimeDb.MsExe)
    assert(det(s("FWS") ++ b(9)) == MimeDb.Swf)
    assert(det(s("SQLite format 3") ++ b(0)) == MimeDb.Sqlite)
    assert(det(s("PAR1") ++ b(21)) == MimeDb.Parquet)
    assert(det(b(0x89) ++ s("HDF") ++ b(0x0d, 0x0a, 0x1a, 0x0a)) == MimeDb.Hdf)
    assert(det(b(0x0e, 0x03, 0x13, 0x01)) == MimeDb.Hdf)          // big32 form
    assert(det(s("MATLAB 5.0 MAT-file")) == MimeDb.Matlab)
    assert(det(b(0x31, 0xbe, 0, 0)) == MimeDb.MsWrite)            // big32
    assert(det(s("%!PS-Adobe-3.0\n")) == MimeDb.PostScript)
    assert(det(b(0, 1, 0, 0) ++ new Array[Byte](8)) == MimeDb.Ttf)
    assert(det(s("OTTO") ++ b(0)) == MimeDb.Otf)
    assert(det(b(0, 1, 0, 0) ++ s("Stand Jet DB")) == MimeDb.MsAccess) // beats ttf p40
  }

  test("script and structured-text magics dispatch to the text parser") {
    assert(det(s("#!/usr/bin/python\nprint(1)\n")) == MimeDb.Python)
    assert(det(s("#!/bin/sh\necho hi\n")) == MimeDb.Sh)
    assert(det(s("#include <stdio.h>\nint main(){}\n")) == MimeDb.CSrc)
    assert(det(s("BEGIN:VCALENDAR\nVERSION:2.0\nEND:VCALENDAR\n")) == MimeDb.Ics)
    assert(det(s("BEGIN:VCARD\nFN:Ada\nEND:VCARD\n")) == MimeDb.VCard)
    // engine: a shell script extracts as text via the supertype walk
    import graft.core.{DocRow, Span, Status}
    val script = "#!/bin/sh\necho corpus extraction works\n"
    val out = graft.engine.Extractor.extract(DocRow("sh1", Seq(Span("bytes",
      graft.corpus.Corpus.b64(script.getBytes("UTF-8")), null, 0))))
    assert(out.mime == MimeDb.Sh)
    assert(out.status == Status.ParseSuccess)
    assert(out.spans.exists(sp => sp.text != null &&
      sp.text.contains("echo corpus extraction works")))
  }

  test("glob tiers: exact name, extension breadth, regex") {
    import MimeRegistry.fromName
    assert(fromName("Makefile").contains("text/x-makefile"))
    assert(fromName("README").contains(MT.TextPlain))
    assert(fromName(".htaccess").contains(MT.TextPlain))
    assert(fromName("rdf").contains("application/rdf+xml"))       // regex tier
    assert(fromName("owl").contains("application/rdf+xml"))
    assert(fromName("a/b/x.tar").contains(MimeDb.Tar))            // path stripped
    // the full ported reference-suite table resolves through fromName
    MimeDb.extGlobs.foreach { case (ext, t) =>
      assert(fromName(s"x.$ext").contains(MimeRegistry.extGlobs(ext)),
        s"ext $ext"); assert(MimeRegistry.extGlobs.contains(ext), s"missing $ext")
      // curated overrides aside, the reference mapping is preserved
      if (!Set("html", "htm", "xml", "pdf", "zip", "docx", "xlsx", "pptx", "gz",
          "rtf", "eml", "odt", "ods", "odp", "epub", "png", "jpg", "jpeg",
          "gif", "txt").contains(ext))
        assert(MimeRegistry.extGlobs(ext) == t, s"ext $ext")
    }
    assert(MimeDb.extGlobs.size >= 700)
  }

  test("name hints still only specialize") {
    // zip bytes + .jar hint → java-archive (sub-class-of zip)
    val zip = graft.corpus.Corpus.zip(Seq("a.txt" -> "hi".getBytes("UTF-8")))
    assert(MimeRegistry.detect(zip, Some("lib.jar")) == "application/java-archive")
    // zip bytes + contradictory .pdf hint → magic wins
    assert(MimeRegistry.detect(zip, Some("doc.pdf")) == MT.Zip)
    // text bytes + .md hint → markdown (text/* prefix rule)
    val md = "# Title\n\nSome prose here.\n".getBytes("UTF-8")
    assert(MimeRegistry.detect(md, Some("notes.md")) == "text/markdown")
  }
  test("round-3 tranche: fonts, executables, science/db, AV containers") {
    assert(det(s("wOFF") ++ b(0, 1)) == MimeDb.Woff)
    assert(det(s("wOF2") ++ b(0, 1)) == MimeDb.Woff2)
    assert(det(s("ITSF") ++ b(3, 0)) == MimeDb.Chm)
    assert(det(s("AT&TFORM") ++ b(0)) == MimeDb.Djvu)
    assert(det(s("FORM") ++ b(0, 0, 1, 0) ++ s("AIFF")) == MimeDb.Aiff)
    assert(det(s("FORM") ++ b(0, 0, 1, 0) ++ s("AIFC")) == MimeDb.Aiff)
    assert(det(s(".snd") ++ b(0, 0, 0, 24)) == MimeDb.AuBasic)
    assert(det(s("#!AMR\n")) == MimeDb.Amr)
    assert(det(b(0xfe, 0xed, 0xfa, 0xce, 0, 0, 0, 18)) == MimeDb.MachO)
    assert(det(b(0xcf, 0xfa, 0xed, 0xfe, 7, 0, 0, 1)) == MimeDb.MachO)
    // fat mach-o: CAFEBABE + arch count 2; java class keeps CAFEBABE+version
    assert(det(b(0xca, 0xfe, 0xba, 0xbe, 0, 0, 0, 2)) == MimeDb.MachOFat)
    assert(det(b(0xca, 0xfe, 0xba, 0xbe, 0, 0, 0, 52)) == MimeDb.JavaClass)
    assert(det(s("dex\n035") ++ b(0)) == MimeDb.Dex)
    assert(det(b(0x76, 0x2f, 0x31, 0x01)) == MimeDb.Exr)
    assert(det(s("P4\n8 8\n")) == MimeDb.Pbm)
    assert(det(s("P5 8 8 255 ")) == MimeDb.Pgm)
    assert(det(s("P6\r8 8 255 ")) == MimeDb.Ppm)
    assert(det(b(0x0a, 0x05, 0x01, 0x08)) == MimeDb.Pcx)
    assert(det(b(0xa1, 0xb2, 0xc3, 0xd4, 0, 2)) == MimeDb.Pcap)
    assert(det(b(0xd4, 0xc3, 0xb2, 0xa1, 0, 2)) == MimeDb.Pcap)
    assert(det(b(0x0a, 0x0d, 0x0d, 0x0a, 0, 0, 0, 28, 0xa1, 0xb2, 0xc3, 0xd4))
      == MimeDb.Pcapng)
    assert(det(b(0xff, 0x57, 0x50, 0x43, 0x10)) == MimeDb.Wpd)
    assert(det(s("hsqs") ++ b(1)) == MimeDb.SquashFs)
    assert(det(s("xar!") ++ b(0, 28)) == MimeDb.XarArchive)
    assert(det(s("d8:announce35:")) == MimeDb.Torrent)
    assert(det(b(0xff, 0x0a, 0x30)) == MimeDb.Jxl)
    assert(det(b(0x00, 0x00, 0x00, 0x0c, 0x4a, 0x58, 0x4c, 0x20,
      0x0d, 0x0a, 0x87, 0x0a)) == MimeDb.Jxl)
    assert(det(s("Cr24") ++ b(2, 0, 0, 0)) == MimeDb.Crx)
    assert(det(s("RIFF") ++ b(1, 2, 3, 4) ++ s("AVI ")) == MimeDb.Avi2)
    assert(det(s(".RMF") ++ b(0)) == MimeDb.RealMedia)
    assert(det(b(30, 5) ++ s("-lh5-")) == MimeDb.Lha)
    assert(det(b(0x60, 0xea, 5, 5)) == MimeDb.Arj)
    assert(det(b(0x78, 0x9c, 0x62, 0x60)) == MimeDb.Zlib)
    // real framed streams lead with the stream-identifier chunk header
    // (ff 06 00 00) before "sNaPpY" — r4g fixed the magic offset
    assert(det(b(0xff, 0x06, 0x00, 0x00) ++ s("sNaPpY")) == MimeDb.SnappyFramed)
    assert(det(s("CDF") ++ b(1, 9)) == MimeDb.Netcdf)
    assert(det(s("GRIB") ++ b(0, 0, 0, 1)) == MimeDb.Grib)
    assert(det(s("SIMPLE  =                    T")) == MimeDb.Fits)
    val dicom = new Array[Byte](136)
    System.arraycopy(s("DICM"), 0, dicom, 128, 4)
    assert(det(dicom) == MimeDb.Dicom)
    assert(det(b(0xd7, 0xcd, 0xc6, 0x9a, 0x00, 0x00, 1)) == MimeDb.Wmf)
    val emf = new Array[Byte](48)
    emf(40) = 0x20; emf(41) = 'E'; emf(42) = 'M'; emf(43) = 'F'
    assert(det(emf) == MimeDb.Emf)
  }

}
