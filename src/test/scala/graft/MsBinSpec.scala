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
    for (i <- Seq(88L, 212L, 964L)) {
      val d = doc(i)
      assert(d.mime ==
        "application/vnd.ms-excel.sheet.binary.macroenabled.12", s"$i: ${d.mime}")
      assert(d.status == Status.ParseSuccess, s"$i: ${d.status}")
      assert(text(d).trim.nonEmpty, i)
    }
  }

  test("pub rows: Publisher detection + Quill story text") {
    for (i <- Seq(621L, 745L, 869L)) {
      val d = doc(i)
      assert(d.mime == "application/x-mspublisher", s"$i: ${d.mime}")
      assert(d.status == Status.ParseSuccess, s"$i: ${d.status}")
      assert(text(d).trim.nonEmpty, i)
    }
  }

  test("access rows: Jet detection + table text") {
    for (i <- Seq(183L, 307L, 431L)) {
      val d = doc(i)
      assert(d.mime == "application/x-msaccess", s"$i: ${d.mime}")
      assert(d.status == graft.core.Status.ParseSuccess, s"$i: ${d.status}")
      assert(text(d).contains("Table1"), i)
    }
  }

  test("vsd rows: Visio detection + chunk text") {
    for (i <- Seq(402L, 526L, 650L)) {
      val d = doc(i)
      assert(d.mime == "application/vnd.visio", s"$i: ${d.mime}")
      assert(d.status == Status.ParseSuccess, s"$i: ${d.status}")
      assert(text(d).trim.nonEmpty, i)
    }
  }
}
