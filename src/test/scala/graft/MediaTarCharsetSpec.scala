package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random
import graft.core.{DocRow, Span, Status}
import graft.corpus.{Corpus, MediaCorpus}
import graft.engine.Extractor
import graft.media.MediaParser
import graft.mime.EncodingDetector
import graft.pkgx.TarUtil

/** Round-2: tar/tar.gz recursion, real media metadata, statistical
  * charset fallback.
  */
class MediaTarCharsetSpec extends AnyFunSuite {

  test("tar writer/reader round-trip incl. prefix paths") {
    val entries = Seq(
      "a.txt" -> "alpha".getBytes("UTF-8"),
      "dir/b.xml" -> "<r>beta</r>".getBytes("UTF-8"),
      "c.html" -> "<html><body><p>g</p></body></html>".getBytes("UTF-8"))
    val tar = TarUtil.write(entries)
    assert(TarUtil.isTar(tar))
    val back = TarUtil.entries(tar)
    assert(back.map(_.name) == entries.map(_._1).toVector)
    assert(back.map(_.data.toSeq) == entries.map(_._2.toSeq).toVector)
  }

  test("engine: tar and tar.gz recurse with ordinal id paths") {
    val tarIdx = (0L until 1000L).filter(i => Corpus.kindOf(i) == "tar")
    val plain = tarIdx.find(_ % 2 == 0).get
    val gzipped = tarIdx.find(_ % 2 == 1).get
    for (idx <- Seq(plain, gzipped)) {
      val out = Extractor.extract(Corpus.row(idx))
      assert(out.status == Status.ParseSuccess, s"tar row $idx -> ${out.status}")
      val opens = out.spans.filter(_.kind == "embedded-open")
      assert(opens.nonEmpty, s"tar row $idx produced no embedded docs")
      // ordinal id paths: /1, /2, ... (gz adds one wrapper level: /1/2...)
      assert(opens.forall(_.media_ref.matches("(/\\d+)+")))
      assert(out.meta.keys.exists(_ == "embedded:path"))
    }
    val gz = Extractor.extract(Corpus.row(gzipped))
    assert(gz.mime == graft.mime.MediaTypes.Gzip)
  }

  test("media parser: PNG/JPEG/GIF/BMP dims, EXIF orientation") {
    val r = new Random(5)
    val png = MediaParser.parse(MediaCorpus.png(r)).get
    assert(png.mime == "image/png" && png.width > 0 && png.height > 0)
    val jr = new Random(6)
    val jb = MediaCorpus.jpeg(jr)
    val j = MediaParser.parse(jb).get
    assert(j.mime == "image/jpeg" && j.width >= 160 && j.height >= 120)
    assert(j.orientation >= 1 && j.orientation <= 8)
    val g = MediaParser.parse(MediaCorpus.gif(new Random(7))).get
    assert(g.mime == "image/gif" && g.width >= 32)
    val b = MediaParser.parse(MediaCorpus.bmp(new Random(8))).get
    assert(b.mime == "image/bmp" && b.width >= 16 && b.height >= 16)
  }

  test("media parser: WAV/MP3 duration + sample rate, MP4 dims + duration") {
    val w = MediaParser.parse(MediaCorpus.wav(new Random(9))).get
    assert(w.mime == "audio/vnd.wave" && w.sampleRate == 8000 && w.channels == 1)
    assert(w.durationMs >= 250 && w.durationMs <= 1300, s"wav dur ${w.durationMs}")
    val m = MediaParser.parse(MediaCorpus.mp3(new Random(10))).get
    assert(m.mime == "audio/mpeg" && m.sampleRate == 44100 && m.durationMs > 0)
    val v = MediaParser.parse(MediaCorpus.mp4(new Random(11))).get
    assert(v.mime == "video/mp4" && v.kind == "video")
    assert(v.width >= 320 && v.height >= 240)
    assert(v.durationMs >= 2000 && v.durationMs <= 62000)
  }

  test("pipeline: media payload rows emit media spans + real metadata") {
    val mediaIdx = (0L until 1000L).filter(i => Corpus.kindOf(i) == "media")
    val pngIdx = mediaIdx.find(_ % 8 == 1).get
    val out = Extractor.extract(Corpus.row(pngIdx))
    assert(out.mime == graft.mime.MediaTypes.Png)
    assert(out.spans.exists(_.kind == Span.KindMedia))
    val widthKeys = out.meta.keys.filter(_.endsWith(":width"))
    assert(widthKeys.nonEmpty, s"no width metadata: ${out.meta.keys}")
    val wavIdx = mediaIdx.find(_ % 8 == 5).get
    val wout = Extractor.extract(Corpus.row(wavIdx))
    assert(wout.meta.keys.exists(_.endsWith(":duration_ms")))
    assert(wout.meta.keys.exists(_.endsWith(":sample_rate")))
    // blob-ref rows keep the pass-through path
    val refIdx = mediaIdx.find(_ % 8 == 0).get
    val rout = Extractor.extract(Corpus.row(refIdx))
    assert(rout.spans.exists(s => s.kind == Span.KindMedia &&
      s.media_ref.startsWith("blob://")))
  }

  test("statistical charset fallback: utf-8 / latin-1 / windows-1252 / bare utf-16") {
    def dec(s: String, cs: String) = EncodingDetector.decode(s.getBytes(cs))
    assert(dec("plain café over utf8", "UTF-8") == "plain café over utf8")
    assert(dec("café résumé latin", "ISO-8859-1") == "café résumé latin")
    // C1 bytes → windows-1252 (em-dash 0x97, euro 0x80)
    assert(dec("price — 5 €", "windows-1252") == "price — 5 €")
    // BOM-less UTF-16LE: NULs at odd offsets
    val le = "hello utf sixteen".getBytes("UTF-16LE")
    assert(EncodingDetector.decode(le) == "hello utf sixteen")
    val be = "hello utf sixteen".getBytes("UTF-16BE")
    assert(EncodingDetector.decode(be) == "hello utf sixteen")
  }

  test("review regressions: hostile containers terminate, short UTF-16 detects") {
    // forged tar size (8 GB in the octal field): Long math must advance
    // the cursor past EOF instead of overflowing into a re-read loop,
    // and the claimed-size budget fails the document as hostile
    val tar = TarUtil.write(Seq("a.txt" -> "x".getBytes("UTF-8")))
    val forged = tar.clone()
    val huge = "77777777777".getBytes("US-ASCII") // ~8G octal
    System.arraycopy(huge, 0, forged, 124, huge.length)
    intercept[graft.engine.ZipBombDetected] { TarUtil.entries(forged) }
    // WAV with a negative/overflowing chunk length must not spin forever
    val wav = MediaCorpus.wav(new Random(3))
    val badWav = wav.clone()
    badWav(16) = 0xf8.toByte; badWav(17) = 0xff.toByte
    badWav(18) = 0xff.toByte; badWav(19) = 0xff.toByte // fmt len = -8
    MediaParser.parse(badWav) // returns (possibly None) — no hang
    // BOM-less UTF-16 under 20 bytes (integer-division bound was 0)
    assert(EncodingDetector.decode("hi utf".getBytes("UTF-16LE")) == "hi utf")
    assert(EncodingDetector.decode("hi utf".getBytes("UTF-16BE")) == "hi utf")
  }

  test("corpus text rows decode accents through the engine") {
    val textIdx = (0L until 1000L).filter(i => Corpus.kindOf(i) == "text")
    val latin = textIdx.find(_ % 4 == 1).get
    val win = textIdx.find(_ % 4 == 3).get
    val lout = Extractor.extract(Corpus.row(latin))
    assert(lout.spans.exists(s => s.text != null && s.text.contains("café résumé")))
    val wout = Extractor.extract(Corpus.row(win))
    assert(wout.spans.exists(s => s.text != null && s.text.contains("price — 5 €")))
  }
}
