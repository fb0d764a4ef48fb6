package graft

import graft.core.Status
import graft.corpus.Corpus
import graft.engine.Extractor
import org.scalatest.funsuite.AnyFunSuite

/** The corpus v19 msbin rotation: every synthetic XLSB/Publisher/VSD row
  * detects to its binary-Office type and parses clean with text.
  */
class MsBinSpec extends AnyFunSuite {

  private def doc(i: Long) = Extractor.extract(Corpus.row(i))
  private def text(d: graft.core.ExtractedDoc): String =
    d.spans.filter(_.kind == graft.core.Span.KindText).map(_.text).mkString

  test("xlsb rows: binary workbook detection + shared-string cells") {
    for (i <- Seq(183L, 402L, 621L)) {
      val d = doc(i)
      assert(d.mime ==
        "application/vnd.ms-excel.sheet.binary.macroenabled.12", s"$i: ${d.mime}")
      assert(d.status == Status.ParseSuccess, s"$i: ${d.status}")
      assert(text(d).trim.nonEmpty, i)
    }
  }

  test("pub rows: Publisher detection + Quill story text") {
    for (i <- Seq(88L, 307L, 526L)) {
      val d = doc(i)
      assert(d.mime == "application/x-mspublisher", s"$i: ${d.mime}")
      assert(d.status == Status.ParseSuccess, s"$i: ${d.status}")
      assert(text(d).trim.nonEmpty, i)
    }
  }

  test("vsd rows: Visio detection + chunk text") {
    for (i <- Seq(212L, 431L, 650L)) {
      val d = doc(i)
      assert(d.mime == "application/vnd.visio", s"$i: ${d.mime}")
      assert(d.status == Status.ParseSuccess, s"$i: ${d.status}")
      assert(text(d).trim.nonEmpty, i)
    }
  }
}
