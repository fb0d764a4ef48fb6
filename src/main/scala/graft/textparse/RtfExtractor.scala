package graft.textparse

import graft.engine.{MetaSink, SpanSink}

/** RTF text extraction.
  *
  * Reference: tika-parsers RTFParser (JFlex-generated lexers; SURVEY.md
  * §2.7). This is an original recursive-descent reader over the RTF
  * token grammar: control words (`\word[N]`), control symbols, groups
  * `{...}`, destination groups (font/color/stylesheet/info tables —
  * skipped), `\'hh` hex escapes (cp1252), `\uN` unicode with skip-count,
  * `\par`/`\line` → newline, `\tab` → tab, `\cell`/`\row` table framing.
  */
object RtfExtractor {

  private val SkipDestinations = Set(
    "fonttbl", "colortbl", "stylesheet", "info", "header", "footer",
    "pict", "object", "datastore", "themedata", "colorschememapping",
    "latentstyles", "listtable", "listoverridetable", "rsidtbl",
    "generator", "xmlnstbl", "wgrffmtfilter")

  def extract(bytes: Array[Byte], sink: SpanSink, meta: MetaSink): Unit = {
    val s = new String(bytes, java.nio.charset.Charset.forName("windows-1252"))
    var i = 0
    val n = s.length
    var skipDepth = 0        // >0 while inside a skipped destination group
    var depth = 0
    var uc = 1               // \ucN: bytes to skip after \u
    var pendingSkip = 0

    def emit(c: Char): Unit = {
      if (pendingSkip > 0) pendingSkip -= 1
      else if (skipDepth == 0) sink.chars(c.toString)
    }

    while (i < n) {
      val c = s.charAt(i)
      c match {
        case '{' => depth += 1; if (skipDepth > 0) skipDepth += 1; i += 1
        case '}' =>
          depth -= 1
          if (skipDepth > 0) skipDepth -= 1
          i += 1
        case '\\' =>
          if (i + 1 >= n) i = n
          else {
            val c1 = s.charAt(i + 1)
            if (c1 == '\'') { // \'hh
              if (i + 3 < n) {
                try emit(Integer.parseInt(s.substring(i + 2, i + 4), 16).toChar)
                catch { case _: NumberFormatException => () }
                i += 4
              } else i = n
            } else if (c1 == '\\' || c1 == '{' || c1 == '}') { emit(c1); i += 2 }
            else if (c1 == '~') { emit(' '); i += 2 } // non-breaking space
            else if (c1 == '*') {
              // \* marks an optional destination: skip the whole group
              if (skipDepth == 0) skipDepth = 1
              i += 2
            } else if (Character.isLetter(c1)) {
              // control word
              var j = i + 1
              while (j < n && Character.isLetter(s.charAt(j))) j += 1
              val word = s.substring(i + 1, j)
              var param = ""
              if (j < n && (s.charAt(j) == '-' || Character.isDigit(s.charAt(j)))) {
                val pStart = j
                j += 1
                while (j < n && Character.isDigit(s.charAt(j))) j += 1
                param = s.substring(pStart, j)
              }
              if (j < n && s.charAt(j) == ' ') j += 1 // delimiter space consumed
              word match {
                case "par" | "line" => if (skipDepth == 0) sink.newline()
                case "tab" => if (skipDepth == 0) sink.tab()
                case "cell" => if (skipDepth == 0) sink.tab()
                case "row" => if (skipDepth == 0) sink.newline()
                case "uc" => uc = param.toIntOption.getOrElse(1)
                case "u" =>
                  if (skipDepth == 0) {
                    param.toIntOption.foreach { code =>
                      val ch = if (code < 0) (code + 65536).toChar else code.toChar
                      sink.chars(ch.toString)
                    }
                    pendingSkip = uc
                  }
                case "emdash" => emit('—')
                case "endash" => emit('–')
                case "lquote" => emit('‘')
                case "rquote" => emit('’')
                case "ldblquote" => emit('“')
                case "rdblquote" => emit('”')
                case "bullet" => emit('•')
                case w if SkipDestinations.contains(w) =>
                  if (skipDepth == 0) skipDepth = 1
                case _ => () // formatting control word: no text
              }
              i = j
            } else i += 2 // unknown control symbol
          }
        case '\r' | '\n' => i += 1 // raw newlines are not content in RTF
        case other => emit(other); i += 1
      }
    }
    sink.flushText()
  }
}
