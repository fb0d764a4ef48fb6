package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Span

/** Output-shaping projections over the extracted spans column — the
  * reference's SAX handler-combinator family re-expressed as derived
  * columns (SURVEY.md §2.8):
  *
  *  - ToTextContentHandler → [[textOf]] (concat of text spans);
  *  - LinkContentHandler / PhoneExtractingContentHandler /
  *    StandardsExtractingContentHandler → regex extractors;
  *  - To(X)HTML/ToMarkdown serializers → [[toXml]]/[[toMarkdown]];
  *  - TeeContentHandler (one parse, many projections) → cache + N selects.
  *
  * All column-level ops are codegen'd built-ins; the serializers are
  * partition-local folds over the span array.
  */
object Projections {

  /** Plain-text projection of a spans column (ToTextContentHandler). */
  def textOf(spans: Column): Column =
    concat_ws("", transform(filter(spans, s => s.getField("kind") === "text"),
      s => s.getField("text")))

  /** Media references in document order. */
  def mediaRefs(spans: Column): Column =
    transform(filter(spans, s => s.getField("kind") === "media"),
      s => s.getField("media_ref"))

  // host and path must not end in '.' — sentence-final punctuation is
  // not part of the link
  private val UrlRegex =
    "(https?://[\\w.-]*\\w(?:/[\\w./%#?&=-]*[\\w/%#?&=-])?)"
  /** LinkContentHandler analog: URLs appearing in extracted text. */
  def extractUrls(text: Column): Column =
    call_function("regexp_extract_all", text, lit(UrlRegex), lit(1))

  private val PhoneRegex =
    "\\+?\\d{1,3}[ .-]\\d{3}[ .-]\\d{3,4}(?:[ .-]\\d{3,4})?"
  /** PhoneExtractingContentHandler analog. */
  def extractPhones(text: Column): Column =
    call_function("regexp_extract_all", text, lit(PhoneRegex), lit(0))

  /** StandardsExtractingContentHandler analog: ISO/RFC/IEEE-style refs. */
  private val StandardRegex = "((?:ISO|IEC|RFC|IEEE|ANSI|NIST)[ -]?\\d{2,6})"
  def extractStandards(text: Column): Column =
    call_function("regexp_extract_all", text, lit(StandardRegex), lit(1))

  // ---- serializers (partition-local folds; used for output modes) ----

  /** ToXMLContentHandler-ish serialization of a span sequence. */
  def toXml(spans: Seq[Span]): String = {
    val b = new StringBuilder("<doc>")
    spans.foreach { s =>
      s.kind match {
        case "text" => b.append("<text offset=\"").append(s.offset).append("\">")
          .append(escape(s.text)).append("</text>")
        case "media" => b.append("<media ref=\"").append(escape(s.media_ref)).append("\"/>")
        case "embedded-open" => b.append("<embedded path=\"")
          .append(escape(s.media_ref)).append("\">")
        case "embedded-close" => b.append("</embedded>")
        case _ => ()
      }
    }
    b.append("</doc>").toString
  }

  /** ToMarkdownContentHandler-ish (markdown is the reference 4.0 default
    * serialization — BasicContentHandlerFactory.java:42).
    */
  def toMarkdown(spans: Seq[Span]): String = {
    val b = new StringBuilder
    spans.foreach { s =>
      s.kind match {
        case "text" => b.append(s.text)
        case "media" => b.append("![](").append(s.media_ref).append(")")
        case "embedded-open" => b.append("\n> embedded ").append(s.media_ref).append("\n")
        case _ => ()
      }
    }
    b.toString
  }

  private def escape(s: String): String =
    if (s == null) ""
    else s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** The reference's recursive-metadata JSON shape (`/rmeta`;
    * tika-serialization JsonMetadataList): a JSON array of metadata
    * objects, container document first (RecursiveParserWrapperHandler
    * .java:100-105), each embedded doc keyed by its ordinal id path with
    * its extracted content under "X-TIKA:content"-like key.
    */
  def toRmetaJson(doc: graft.core.ExtractedDoc): String = {
    def jstr(s: String): String =
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
    val containerText = doc.spans.collect {
      case s if s.kind == "text" => s.text
    }.mkString
    val containerFields = Seq(
      s""""tk:doc_id":${jstr(doc.doc_id)}""",
      s""""Content-Type":${jstr(doc.mime)}""",
      s""""tk:status":${jstr(doc.status)}""",
      s""""tk:content":${jstr(containerText)}""") ++
      doc.meta.toSeq.sortBy(_._1).map { case (k, vs) =>
        s"${jstr(k)}:${vs.map(jstr).mkString("[", ",", "]")}"
      }
    val container = containerFields.mkString("{", ",", "}")
    val embedded = doc.meta.keys.filter(_.startsWith("embedded:/")).toSeq.sorted.map { k =>
      val path = k.stripPrefix("embedded:")
      s"""{"tk:embedded_id_path":${jstr(path)},""" +
      s""""Content-Type":${jstr(doc.meta(k).headOption.orNull)}}"""
    }
    (container +: embedded).mkString("[", ",", "]")
  }

  /** TeeContentHandler analog: one extraction, several projections —
    * callers should cache `extracted` before fanning out.
    */
  def projectAll(extracted: DataFrame): DataFrame = {
    val text = textOf(col("spans"))
    extracted.select(col("doc_id"), col("mime"), col("status"),
      text.as("text"),
      mediaRefs(col("spans")).as("media"),
      extractUrls(text).as("urls"),
      extractStandards(text).as("standards"))
  }

  /** Mapped-XHTML projection over a row's RAW payload spans: the first
    * HTML payload serializes through the given HtmlMapper strategy
    * (strict whitelist or markup-preserving identity — reference
    * HtmlMapper/IdentityHtmlMapper); non-HTML rows yield "". Payload
    * bytes decode exactly once per span.
    */
  def toMappedXhtml(spans: Seq[Span], mapper: graft.html.HtmlMapper): String =
    spans.sortBy(_.offset).iterator
      .filter(_.kind != Span.KindMedia)
      .map(sp => graft.engine.Extractor.payloadBytes(sp))
      .find(bytes => graft.mime.MimeRegistry.detect(bytes, None) ==
        graft.mime.MediaTypes.Html)
      .map(bytes => graft.html.MappedXhtml.serialize(
        graft.mime.EncodingDetector.decode(bytes), mapper))
      .getOrElse("")
}

/** tika-eval ExtractProfiler / ExtractComparer analogs — A/B comparison
  * of two extraction runs over the same corpus (the regression harness
  * between pipeline versions; tika-eval-app ExtractComparer.java).
  */
object ExtractCompare {

  /** Per-doc diff between two extraction outputs joined on doc_id. */
  def compare(a: DataFrame, b: DataFrame): DataFrame = {
    val aa = a.select(col("doc_id"), col("mime").as("mime_a"),
      col("status").as("status_a"), col("n_spans").as("n_spans_a"),
      col("n_chars").as("n_chars_a"), col("spans").as("spans_a"))
    val bb = b.select(col("doc_id"), col("mime").as("mime_b"),
      col("status").as("status_b"), col("n_spans").as("n_spans_b"),
      col("n_chars").as("n_chars_b"), col("spans").as("spans_b"))
    aa.join(bb, Seq("doc_id"), "full_outer")
      .withColumn("in_both", col("mime_a").isNotNull && col("mime_b").isNotNull)
      .withColumn("mime_match", col("mime_a") <=> col("mime_b"))
      .withColumn("status_match", col("status_a") <=> col("status_b"))
      .withColumn("spans_equal", col("spans_a") <=> col("spans_b"))
      .withColumn("char_delta",
        coalesce(col("n_chars_b"), lit(0L)) - coalesce(col("n_chars_a"), lit(0L)))
  }

  /** Corpus-level profile of a comparison (the XLSX-report numbers). */
  def profile(cmp: DataFrame): DataFrame = {
    cmp.agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("in_both"), 1L).otherwise(0L)).as("n_in_both"),
      sum(when(col("spans_equal"), 1L).otherwise(0L)).as("n_span_equal"),
      sum(when(col("mime_match"), 1L).otherwise(0L)).as("n_mime_match"),
      sum(when(col("status_match"), 1L).otherwise(0L)).as("n_status_match"),
      sum(abs(col("char_delta"))).as("total_char_delta"))
      .withColumn("span_equality_rate",
        round(col("n_span_equal").cast("double") / col("n_docs"), 6))
  }
}
