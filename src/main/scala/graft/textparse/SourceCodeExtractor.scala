package graft.textparse

import graft.engine.{MetaSink, SpanSink}
import graft.mime.EncodingDetector

/** Source-code extraction for the three types the reference's
  * SourceCodeParser supports (text/x-java-source, text/x-groovy,
  * text/x-c++src).
  *
  * Reference behavior (NOT code): tika-parser-code-module
  * SourceCodeParser.java — text output is the code lines verbatim, an
  * `LoC` line count, and `dc:creator` from `@author ...` javadoc lines;
  * the XHTML render additionally classifies every token via the
  * external jhighlight lexer (java_keyword / java_comment /
  * java_string / java_plain spans). Here the lexer is from scratch: a
  * single C-family tokenizer (line/block comments, string/char
  * literals with escapes, numeric literals, identifiers vs per-language
  * keyword sets) whose per-class token counts land in `code:*`
  * metadata — the same classification the reference's spans carry,
  * re-expressed as the columnar face a training pipeline can filter on.
  */
object SourceCodeExtractor {

  private val AuthorRe =
    java.util.regex.Pattern.compile("(?im)@author (.*) *$")

  private val JavaKeywords: Set[String] = Set(
    "abstract", "assert", "boolean", "break", "byte", "case", "catch",
    "char", "class", "const", "continue", "default", "do", "double",
    "else", "enum", "extends", "final", "finally", "float", "for",
    "goto", "if", "implements", "import", "instanceof", "int",
    "interface", "long", "native", "new", "package", "private",
    "protected", "public", "return", "short", "static", "strictfp",
    "super", "switch", "synchronized", "this", "throw", "throws",
    "transient", "try", "void", "volatile", "while", "true", "false",
    "null", "var", "record", "sealed", "permits", "yield")

  private val GroovyKeywords: Set[String] = JavaKeywords ++ Set(
    "def", "in", "as", "trait", "it", "println")

  private val CppKeywords: Set[String] = Set(
    "alignas", "alignof", "and", "asm", "auto", "bool", "break", "case",
    "catch", "char", "class", "const", "constexpr", "const_cast",
    "continue", "decltype", "default", "delete", "do", "double",
    "dynamic_cast", "else", "enum", "explicit", "export", "extern",
    "false", "float", "for", "friend", "goto", "if", "inline", "int",
    "long", "main", "mutable", "namespace", "new", "noexcept", "not",
    "nullptr", "operator", "or", "private", "protected", "public",
    "register", "reinterpret_cast", "return", "short", "signed",
    "sizeof", "static", "static_assert", "static_cast", "struct",
    "switch", "template", "this", "throw", "true", "try", "typedef",
    "typeid", "typename", "union", "unsigned", "using", "virtual",
    "void", "volatile", "wchar_t", "while", "include", "define",
    "ifdef", "ifndef", "endif", "pragma", "cout", "cin", "endl")

  private def keywords(mime: String): Set[String] = mime match {
    case "text/x-groovy" => GroovyKeywords
    case "text/x-c++src" => CppKeywords
    case _ => JavaKeywords
  }

  final case class TokenCounts(keyword: Int, plain: Int, comment: Int,
      string: Int, number: Int)

  /** One pass of the C-family lexer: token counts by class. Exposed for
    * the spec; `extract` records the counts as metadata. */
  def lex(text: String, mime: String): TokenCounts = {
    val kw = keywords(mime)
    val groovy = mime == "text/x-groovy"
    var keyword, plain, comment, string, number = 0
    val n = text.length
    var i = 0
    while (i < n) {
      val c = text.charAt(i)
      if (c == '/' && i + 1 < n && text.charAt(i + 1) == '/') {
        // line comment
        while (i < n && text.charAt(i) != '\n') i += 1
        comment += 1
      } else if (c == '/' && i + 1 < n && text.charAt(i + 1) == '*') {
        // block comment
        val end = text.indexOf("*/", i + 2)
        i = if (end < 0) n else end + 2
        comment += 1
      } else if (c == '"' || (c == '\'' && !groovy && isCharLit(text, i)) ||
          (c == '\'' && groovy)) {
        // string / char literal with escape handling (groovy also
        // quotes strings with ')
        val quote = c
        i += 1
        var done = false
        while (i < n && !done) {
          val ch = text.charAt(i)
          if (ch == '\\' && i + 1 < n) i += 2
          else if (ch == quote) { i += 1; done = true }
          else if (ch == '\n') done = true // unterminated: stop at EOL
          else i += 1
        }
        string += 1
      } else if (Character.isDigit(c)) {
        while (i < n && (Character.isLetterOrDigit(text.charAt(i)) ||
            text.charAt(i) == '.' || text.charAt(i) == '_')) i += 1
        number += 1
      } else if (Character.isJavaIdentifierStart(c)) {
        val s = i
        while (i < n && Character.isJavaIdentifierPart(text.charAt(i)))
          i += 1
        if (kw.contains(text.substring(s, i))) keyword += 1 else plain += 1
      } else i += 1 // whitespace / operators / punctuation
    }
    TokenCounts(keyword, plain, comment, string, number)
  }

  /** A bare ' is a char literal only if it closes within a few chars —
    * keeps apostrophes inside C++ `operator'` edge text from eating the
    * rest of the line (heuristic shared by real lexers). */
  private def isCharLit(text: String, i: Int): Boolean = {
    var j = i + 1
    var len = 0
    while (j < text.length && len < 4) {
      val c = text.charAt(j)
      if (c == '\\') { j += 2; len += 1 }
      else if (c == '\'') return len > 0
      else if (c == '\n') return false
      else { j += 1; len += 1 }
    }
    false
  }

  def extract(bytes: Array[Byte], sink: SpanSink, meta: MetaSink,
      mime: String): Unit = {
    val text = EncodingDetector.decode(bytes)
    val lines = text.split("\n", -1)
    // trailing newline produces one empty trailing element, not a line
    val nLines = if (lines.nonEmpty && lines.last.isEmpty) lines.length - 1
      else lines.length
    var i = 0
    while (i < nLines) {
      sink.chars(lines(i).stripSuffix("\r"))
      sink.newline()
      i += 1
    }
    // reference: metadata.set("LoC", nbLines) + CREATOR per @author line
    meta.set("LoC", nLines.toString)
    val m = AuthorRe.matcher(text)
    while (m.find()) meta.add("dc:creator", m.group(1).trim)
    val t = lex(text, mime)
    meta.set("code:tokens_keyword", t.keyword.toString)
    meta.set("code:tokens_plain", t.plain.toString)
    meta.set("code:tokens_comment", t.comment.toString)
    meta.set("code:tokens_string", t.string.toString)
    meta.set("code:tokens_number", t.number.toString)
  }
}
