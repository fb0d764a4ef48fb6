package graft

import graft.core.{DocRow, Span, Status}
import graft.corpus.Corpus
import graft.engine.Extractor
import graft.pkgx.DumpArchive
import org.scalatest.funsuite.AnyFunSuite

/** BSD dump(8) archives: reader/writer round-trip, path resolution
  * through the dirent tree, hostile-input guards, and PackageParser-
  * style recursion (reference: pkg/PackageParser.java:155 dispatches
  * DumpArchiveInputStream members as embedded docs).
  */
class DumpArchiveSpec extends AnyFunSuite {

  private val files = Seq(
    "readme.txt" -> "hello from the root directory\n".getBytes("UTF-8"),
    "docs/guide.txt" -> "nested guide text\n".getBytes("UTF-8"),
    "docs/deep/note.txt" -> ("x" * 3000).getBytes("UTF-8"), // 3 records
    "empty.bin" -> Array.emptyByteArray)

  test("round-trip: paths, content, summary") {
    val bytes = DumpArchive.writeDump(files, label = "lbl", hostname = "host1")
    assert(DumpArchive.isDump(bytes))
    val s = DumpArchive.summary(bytes)
    assert(s.label == "lbl" && s.hostname == "host1")
    val got = DumpArchive.entries(bytes).map(e => e.name -> e.data.toSeq).toMap
    assert(got.keySet == files.map(_._1).toSet)
    files.foreach { case (n, d) => assert(got(n) == d.toSeq, n) }
  }

  test("multi-record file spans TS_INODE data records with exact size") {
    val big = Array.tabulate[Byte](5000)(i => (i % 251).toByte)
    val bytes = DumpArchive.writeDump(Seq("big.bin" -> big))
    val e = DumpArchive.entries(bytes)
    assert(e.map(_.name) == Vector("big.bin"))
    assert(e.head.data.toSeq == big.toSeq)
  }

  test("detection + recursion: members extract as embedded docs") {
    // text-only members: the zero-byte member of `files` is recorded
    // unsupported by the engine (octet-stream child), which is the
    // ParseSuccessWithException taxonomy, not a clean success
    val bytes = DumpArchive.writeDump(files.filter(_._2.nonEmpty))
    val d = Extractor.extract(DocRow("backup.dump",
      Seq(Span("bytes", Corpus.b64(bytes), null, 0))))
    assert(d.mime == "application/x-tika-unix-dump", d.mime)
    assert(d.status == Status.ParseSuccess)
    assert(d.meta.get("dump:hostname").exists(_.contains("localhost")))
    val t = d.spans.filter(_.kind == Span.KindText).map(_.text).mkString("\n")
    assert(t.contains("hello from the root directory"))
    assert(t.contains("nested guide text"))
    val paths = d.meta.getOrElse("embedded:path", Seq.empty)
    assert(paths.exists(_.endsWith("docs/deep/note.txt")), paths)
  }

  test("hostile inputs: truncation, bad checksum, compressed flag, size bomb") {
    val bytes = DumpArchive.writeDump(files)
    // truncated mid-archive: malformed, never a crash
    intercept[RuntimeException](
      DumpArchive.entries(java.util.Arrays.copyOf(bytes, 2500)))
    // flipped byte in the TS_TAPE header breaks the 84446 checksum
    val bad = bytes.clone(); bad(700) = (bad(700) ^ 0x55).toByte
    intercept[DumpArchive.DumpMalformed](DumpArchive.entries(bad))
    // compressed flag rejected (c_flags at 888) — re-checksum so only
    // the flag is at fault
    val comp = bytes.clone(); comp(888) = (comp(888) | 0x80).toByte
    val delta = 0x80 // flag added to word at 888; fix word at 28
    val old28 = (comp(28) & 0xff) | ((comp(29) & 0xff) << 8) |
      ((comp(30) & 0xff) << 16) | ((comp(31) & 0xff) << 24)
    val nu = old28 - delta
    comp(28) = nu.toByte; comp(29) = (nu >> 8).toByte
    comp(30) = (nu >> 16).toByte; comp(31) = (nu >> 24).toByte
    intercept[DumpArchive.DumpMalformed](DumpArchive.entries(comp))
    // declared size beyond the budget trips the bomb guard, not OOM
    val bomb = DumpArchive.writeDump(Seq("a.bin" -> "x".getBytes))
    // find a.bin's TS_INODE record (5th record: tape, clri+map, bits+map,
    // root dir...) — patch di_size to 1 GiB and re-checksum
    var off = 1024
    var found = -1
    while (found < 0 && off + 1024 <= bomb.length) {
      val t = (bomb(off) & 0xff) | ((bomb(off + 1) & 0xff) << 8)
      val mode = (bomb(off + 32) & 0xff) | ((bomb(off + 33) & 0xff) << 8)
      if (t == 2 && ((mode >> 12) & 0xf) == 8) found = off
      else off += 1024
    }
    assert(found > 0)
    def w32(o: Int, v: Int): Unit = {
      bomb(o) = v.toByte; bomb(o + 1) = (v >> 8).toByte
      bomb(o + 2) = (v >> 16).toByte; bomb(o + 3) = (v >> 24).toByte
    }
    w32(found + 40, 1 << 30)
    var sum = 0
    var i = 0
    while (i < 1024) {
      sum += (bomb(found + i) & 0xff) | ((bomb(found + i + 1) & 0xff) << 8) |
        ((bomb(found + i + 2) & 0xff) << 16) | ((bomb(found + i + 3) & 0xff) << 24)
      i += 4
    }
    val cur28 = (bomb(found + 28) & 0xff) | ((bomb(found + 29) & 0xff) << 8) |
      ((bomb(found + 30) & 0xff) << 16) | ((bomb(found + 31) & 0xff) << 24)
    w32(found + 28, cur28 + (84446 - sum))
    intercept[graft.engine.ZipBombDetected](
      DumpArchive.entries(bomb, maxTotalBytes = 64 * 1024 * 1024))
    // and through the extractor: recorded status, no escape
    val d = Extractor.extract(DocRow("t.dump",
      Seq(Span("bytes", Corpus.b64(java.util.Arrays.copyOf(bytes, 2500)),
        null, 0))))
    assert(d.status != null && d.mime != null)
  }

  test("property: mutated dump payloads never escape the envelope") {
    val rnd = new scala.util.Random(23)
    val valid = DumpArchive.writeDump(files)
    (0 until 60).foreach { i =>
      val mutated = valid.clone()
      i % 3 match {
        case 0 =>
          val p = rnd.nextInt(mutated.length)
          mutated(p) = (mutated(p) ^ (1 << rnd.nextInt(8))).toByte
        case 1 =>
          val n = 1 + rnd.nextInt(mutated.length)
          val out = Extractor.extract(DocRow("f",
            Seq(Span("bytes", Corpus.b64(java.util.Arrays.copyOf(mutated, n)),
              null, 0))))
          assert(out.status != null && out.mime != null)
        case _ =>
          val p = rnd.nextInt(mutated.length)
          (p until mutated.length).foreach(j =>
            mutated(j) = rnd.nextInt(256).toByte)
      }
      val out = Extractor.extract(DocRow("f",
        Seq(Span("bytes", Corpus.b64(mutated), null, 0))))
      assert(out.status != null && out.mime != null)
    }
  }
}
