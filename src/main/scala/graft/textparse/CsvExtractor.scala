package graft.textparse

import graft.engine.{MetaSink, SpanSink}

/** CSV/TSV sniffing + table extraction.
  *
  * Reference: tika-parsers text-module TextAndCSVParser (~600 LoC) — the
  * parser registered for text/plain AND text/csv sniffs the delimiter
  * from the first lines and, when line structure is consistent, emits a
  * `<table>` (→ tab-prefixed cells, newline-terminated rows under the
  * XHTML serialization rules); otherwise the payload stays plain text.
  */
object CsvExtractor {

  /** Tab first: an explicit tab is rarely accidental, while prose cells
    * often contain one consistent comma ("Doe, John") that would
    * otherwise win on candidate order alone.
    */
  val Candidates: Seq[Char] = Seq('\t', ',', ';', '|')
  val SniffLines = 10

  /** Returns the sniffed delimiter when the text looks like a delimited
    * table: >=2 lines, >=2 columns, consistent column count across the
    * sniffed lines. Among consistent candidates the one yielding the
    * MOST columns wins (TextAndCSVParser scores candidates rather than
    * taking the first).
    */
  def sniff(text: String): Option[Char] = {
    val lines = text.split("\n", SniffLines + 1).take(SniffLines)
      .map(_.stripSuffix("\r")).filter(_.nonEmpty)
    if (lines.length < 2) return None
    val consistent = Candidates.flatMap { d =>
      val counts = lines.map(countUnquoted(_, d))
      if (counts.head >= 1 && counts.distinct.length == 1) Some(d -> counts.head)
      else None
    }
    if (consistent.isEmpty) None
    else Some(consistent.maxBy(_._2)._1) // stable: ties keep Candidates order
  }

  private def countUnquoted(line: String, d: Char): Int = {
    var n = 0
    var inQ = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (c == '"') inQ = !inQ
      else if (c == d && !inQ) n += 1
      i += 1
    }
    n
  }

  /** Parse one CSV line honoring double-quote quoting. */
  def splitLine(line: String, d: Char): Vector[String] = {
    val out = Vector.newBuilder[String]
    val cell = new StringBuilder
    var inQ = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQ) {
        if (c == '"') {
          if (i + 1 < line.length && line.charAt(i + 1) == '"') { cell.append('"'); i += 1 }
          else inQ = false
        } else cell.append(c)
      } else {
        if (c == '"') inQ = true
        else if (c == d) { out += cell.toString; cell.setLength(0) }
        else cell.append(c)
      }
      i += 1
    }
    out += cell.toString
    out.result()
  }

  /** Emit the delimited text as table cells/rows. */
  def extract(text: String, delimiter: Char, sink: SpanSink, meta: MetaSink): Unit = {
    meta.set("csv:delimiter", delimiter match {
      case ',' => "comma"; case '\t' => "tab"; case ';' => "semicolon"
      case '|' => "pipe"; case c => c.toString
    })
    var nRows = 0
    text.split("\n").foreach { raw =>
      val line = raw.stripSuffix("\r")
      if (line.nonEmpty) {
        splitLine(line, delimiter).foreach { cell =>
          sink.tab()
          sink.chars(cell)
        }
        sink.newline()
        nRows += 1
      }
    }
    meta.set("csv:num_rows", nRows.toString)
  }
}
