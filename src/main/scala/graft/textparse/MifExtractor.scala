package graft.textparse

import graft.engine.{MetaSink, SpanSink}
import graft.mime.EncodingDetector

/** Adobe FrameMaker MIF (Maker Interchange Format) text extraction.
  *
  * Reference behavior: tika-parsers .../mif/MIFExtractor.java +
  * MIFContentHandler.java — line-oriented `<Tag …>` statements: an
  * unbalanced `<Tag` opens a block, a leading `>` closes it, and a
  * one-line `<Tag value>` is a leaf. Text lives in `String` leaves
  * (backtick…quote delimited) grouped into `Para` paragraphs;
  * `PageType` leaves drive the body/master/reference page counters.
  */
object MifExtractor {

  final class MifMalformed(msg: String) extends Exception(msg)

  private val SelfTag = """(<(\S*))(\s)(.*)(\>).*""".r
  private val OpenTag = """<(\S*).*""".r

  def extract(bytes: Array[Byte], sink: SpanSink, meta: MetaSink): Unit = {
    val (cs, bom) = EncodingDetector.detect(bytes)
    val text = new String(bytes, bom, bytes.length - bom, cs)
    if (!text.startsWith("<MIFFile") && !text.startsWith("<MakerFile") &&
        !text.startsWith("<Book") && !text.startsWith("<MakerDictionary"))
      throw new MifMalformed("not a MIF statement stream")

    var bodyPages, masterPages, refPages = 0
    val para = new StringBuilder()
    var inPara = 0
    def endPara(): Unit = {
      if (para.nonEmpty) {
        sink.chars(para.toString)
        sink.newline()
        para.setLength(0)
      }
    }
    val stack = scala.collection.mutable.Stack[String]()
    text.linesIterator.foreach { line0 =>
      val line = line0.trim
      if (line.contains("<") && !line.contains(">")) {
        line match {
          case OpenTag(name) =>
            stack.push(name)
            if (name == "Para") inPara += 1
          case _ => ()
        }
      } else if (line.startsWith(">")) {
        if (stack.nonEmpty) {
          val name = stack.pop()
          if (name == "Para" && inPara > 0) { inPara -= 1; endPara() }
        }
      } else {
        line match {
          case SelfTag(_, name, _, rawValue, _) =>
            val value = {
              var v = rawValue
              if (v.startsWith("`")) v = v.substring(1)
              if (v.endsWith("'")) v = v.substring(0, v.length - 1)
              v
            }
            name match {
              case "String" => para.append(value)
              case "PageType" => value match {
                case "BodyPage" => bodyPages += 1
                case "LeftMasterPage" | "RightMasterPage" | "OtherMasterPage" =>
                  masterPages += 1
                case "ReferencePage" => refPages += 1
                case _ => ()
              }
              case _ => ()
            }
          case _ => ()
        }
      }
    }
    endPara()
    meta.set("meta:page-count", bodyPages.toString)
    meta.set("mif:master-pages", masterPages.toString)
    meta.set("mif:reference-pages", refPages.toString)
  }
}
