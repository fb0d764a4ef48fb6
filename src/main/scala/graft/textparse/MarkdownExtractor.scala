package graft.textparse

import graft.engine.{MetaSink, SpanSink}
import graft.mime.EncodingDetector

/** Markdown → text spans.
  *
  * Reference analog: tika-parsers text-module MarkdownParser (commonmark
  * based); this is an original line-oriented subset for the training-
  * pipeline surface: ATX headings (first H1 → dc:title), list items,
  * blockquotes, fenced code blocks (kept verbatim), inline link syntax
  * `[text](url)` flattened to its text with the url recorded as a link,
  * emphasis/code markers stripped. Reached via the `.md` name-hint glob
  * (markdown has no magic) — archive members and fetch keys carry names.
  */
object MarkdownExtractor {

  private val Link = """\[([^\]]*)\]\(([^)\s]+)[^)]*\)""".r
  private val Image = """!\[([^\]]*)\]\(([^)\s]+)[^)]*\)""".r

  def extract(bytes: Array[Byte], sink: SpanSink, meta: MetaSink): Unit = {
    val text = EncodingDetector.decode(bytes)
    var inFence = false
    var sawTitle = false
    val para = new StringBuilder

    def flushPara(): Unit = {
      if (para.nonEmpty) {
        sink.chars(para.toString.trim)
        sink.newline()
        para.setLength(0)
      }
    }

    def inline(s: String): String = {
      var t = Image.replaceAllIn(s, m => {
        meta.add("links", m.group(2))
        java.util.regex.Matcher.quoteReplacement(m.group(1))
      })
      t = Link.replaceAllIn(t, m => {
        meta.add("links", m.group(2))
        java.util.regex.Matcher.quoteReplacement(m.group(1))
      })
      // strip emphasis/code markers but keep their content
      t.replaceAll("""(\*\*|__|\*|_|`)""", "")
    }

    text.split("\r\n|\r|\n", -1).foreach { line =>
      val trimmed = line.trim
      if (trimmed.startsWith("```") || trimmed.startsWith("~~~")) {
        flushPara()
        inFence = !inFence
      } else if (inFence) {
        sink.chars(line) // code verbatim, line-per-line
        sink.newline()
      } else if (trimmed.isEmpty) {
        flushPara()
      } else if (trimmed.startsWith("#")) {
        flushPara()
        val level = trimmed.takeWhile(_ == '#').length
        val heading = inline(trimmed.dropWhile(_ == '#').trim)
        if (level == 1 && !sawTitle && heading.nonEmpty) {
          meta.set("dc:title", heading)
          sawTitle = true
        }
        sink.chars(heading)
        sink.newline()
      } else if (trimmed.startsWith("- ") || trimmed.startsWith("* ") ||
                 trimmed.startsWith("+ ") || trimmed.matches("""\d+\.\s.*""")) {
        flushPara()
        sink.tab()
        sink.chars(inline(trimmed.replaceFirst("""^([-*+]|\d+\.)\s+""", "")))
        sink.newline()
      } else if (trimmed.startsWith(">")) {
        flushPara()
        sink.chars(inline(trimmed.dropWhile(c => c == '>' || c == ' ')))
        sink.newline()
      } else {
        if (para.nonEmpty) para.append(' ')
        para.append(inline(trimmed))
      }
    }
    flushPara()
  }
}
