package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.Corpus
import graft.engine.Extractor

/** Frozen golden span sequences (FIXTURES.md §4).
  *
  * The first 60 corpus rows' extraction results are serialized to a
  * golden JSON file keyed by `Corpus.Version`. Any semantic drift in a
  * parser shows up as a diff against the frozen file. To re-bless after
  * an INTENTIONAL semantics change: delete the golden file, run this
  * suite once (it regenerates), review the diff, commit.
  */
class GoldenSpansSpec extends AnyFunSuite {

  private val goldenPath =
    Paths.get("src/test/resources/golden", s"corpus-spans-v${Corpus.Version}.json")

  private def esc(s: String): String =
    if (s == null) "null"
    else "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def render(): String = {
    // rows 0-59 plus the nearest rows of the sparse kinds
    // (7z / ar / cpio / onenote, v17's sci rotation grib/mat/nc, and
    // v18's fixed rotation xps/emf/wmf) so every format family is frozen
    // v20 msbin rotation: 88 xlsb / 621 pub / 402 vsd / 183 access
    // v22: 635 = the archive kind's stored-rar4 rotation slot
    // v23: 174 mp3 (ID3 + APIC cover child) and 79 mp4 (ilst tags)
    val docs = ((0L until 60L) ++ Seq(73L, 102L, 168L, 197L, 635L,
      116L, 240L, 1459L, 153L, 715L, 2153L, 88L, 621L, 402L, 183L,
      174L, 79L)).map { i =>
      val d = Extractor.extract(Corpus.row(i))
      val spans = d.spans.map(s =>
        s"""{"kind":${esc(s.kind)},"text":${esc(s.text)},""" +
        s""""media_ref":${esc(s.media_ref)},"offset":${s.offset}}""")
        .mkString("[", ",", "]")
      s"""{"doc_id":${esc(d.doc_id)},"mime":${esc(d.mime)},""" +
      s""""status":${esc(d.status)},"spans":$spans}"""
    }
    docs.mkString("[\n", ",\n", "\n]\n")
  }

  test("extraction matches the frozen golden span sequences") {
    val current = render()
    if (!Files.exists(goldenPath)) {
      Files.createDirectories(goldenPath.getParent)
      Files.writeString(goldenPath, current)
      info(s"golden file created: $goldenPath — review and commit it")
    } else {
      val golden = Files.readString(goldenPath)
      if (golden != current) {
        // locate first differing line for a useful failure message
        val gl = golden.split("\n"); val cl = current.split("\n")
        val idx = gl.zip(cl).indexWhere { case (a, b) => a != b }
        val at = if (idx >= 0) idx else math.min(gl.length, cl.length)
        fail(s"golden mismatch at line $at:\n golden: ${gl.lift(at).getOrElse("<eof>")}\n" +
          s" actual: ${cl.lift(at).getOrElse("<eof>")}")
      }
    }
  }
}
