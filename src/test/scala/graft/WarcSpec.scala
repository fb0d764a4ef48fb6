package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8
import graft.core.{DocRow, Span, Status}
import graft.corpus.Corpus
import graft.engine.Extractor
import graft.warc.WarcExtractor

/** WARC web-archive parsing (round-3 verdict item #3): record framing,
  * response recursion with warc:/warc:http: metadata, warc.gz via the
  * gzip branch, and hostile-input behavior.
  */
class WarcSpec extends AnyFunSuite {

  private def sampleWarc: Array[Byte] = WarcExtractor.write(Seq(
    ("http://example.com/page.html", "text/html",
      "<html><head><title>Warc Page</title></head><body><p>warc body text</p></body></html>"
        .getBytes(UTF_8)),
    ("http://example.com/notes.txt", "text/plain",
      "plain warc member text".getBytes(UTF_8))))

  test("record framing: warcinfo + responses round-trip the writer") {
    val recs = WarcExtractor.records(sampleWarc)
    assert(recs.map(_.warcType) == Vector("warcinfo", "response", "response"))
    assert(recs(1).targetUri.contains("http://example.com/page.html"))
    val http = WarcExtractor.parseHttpHead(recs(1).body).get
    assert(http.status == 200 && http.reason == "OK")
    assert(new String(recs(1).body, http.payloadOffset,
      recs(1).body.length - http.payloadOffset, UTF_8).startsWith("<html>"))
  }

  test("response records recurse as embedded docs with warc metadata") {
    val out = Extractor.extract(DocRow("w1",
      Seq(Span("bytes", Corpus.b64(sampleWarc), null, 0))))
    assert(out.mime == "application/warc")
    assert(out.status == Status.ParseSuccess)
    // two response members, ordinal id paths; warcinfo skipped
    assert(out.spans.count(_.kind == "embedded-open") == 2)
    assert(out.spans.exists(s => s.kind == "embedded-open" && s.media_ref == "/1"))
    val text = out.spans.filter(_.kind == "text").map(_.text).mkString("\n")
    assert(text.contains("warc body text"))
    assert(text.contains("plain warc member text"))
    assert(out.meta("embedded:path").contains("/1:http://example.com/page.html"))
    assert(out.meta("warc:/1:WARC-Target-URI") ==
      Seq("http://example.com/page.html"))
    assert(out.meta("warc:http:/1:status") == Seq("200"))
    assert(out.meta("warc:http:/1:Content-Type") == Seq("text/html"))
    // html member parsed as html: title metadata from the embedded doc
    // r4: embedded docs' document-level metadata is path-scoped (the
    // RecursiveParserWrapper per-document model) — the response page's
    // title lands under its embedded path instead of clobbering the root
    assert(out.meta.get("embedded:/1:title").exists(_.contains("Warc Page")),
      out.meta.keys)
  }

  test("warc.gz recurses through the gzip branch (inner re-detect)") {
    val gz = Corpus.gzipBytes(sampleWarc)
    val out = Extractor.extract(DocRow("w2",
      Seq(Span("bytes", Corpus.b64(gz), null, 0))))
    assert(out.mime == "application/gzip")
    assert(out.status == Status.ParseSuccess)
    assert(out.meta("embedded:/1") == Seq("application/warc"))
    // members nest one level deeper: /1/2, /1/3 (gzip child is /1)
    assert(out.spans.exists(s => s.kind == "embedded-open" && s.media_ref == "/1/2"))
    val text = out.spans.filter(_.kind == "text").map(_.text).mkString("\n")
    assert(text.contains("warc body text"))
  }

  test("renamed bytes still detect as warc via the WARC/ magic") {
    assert(graft.mime.MimeRegistry.detect(sampleWarc, None) == "application/warc")
  }

  test("hostile input: garbage throws, trailing garbage after records tolerated") {
    intercept[WarcExtractor.WarcMalformed] {
      WarcExtractor.records("HTTP/1.1 200 OK\r\n\r\n".getBytes(UTF_8))
    }
    val withTrailer = sampleWarc ++ "not a warc record\r\n".getBytes(UTF_8)
    assert(WarcExtractor.records(withTrailer).length == 3)
    // truncated final record: body clamped to EOF, no crash
    val truncated = java.util.Arrays.copyOfRange(sampleWarc, 0, sampleWarc.length - 40)
    val recs = WarcExtractor.records(truncated)
    assert(recs.length == 3)
    // bad Content-Length fails the document as a recorded exception
    val bad = "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: zzz\r\n\r\n"
      .getBytes(UTF_8)
    val out = Extractor.extract(DocRow("w3",
      Seq(Span("bytes", Corpus.b64(bad), null, 0))))
    assert(out.status == Status.ParseException)
  }

  test("wacz-shaped zip: a .warc member recurses through zip → warc → html") {
    // WACZ (reference wacz/WACZParser.java) is a zip with archive/*.warc.gz
    // members; our container recursion composes zip → (gzip →) warc
    // without a dedicated parser
    val wacz = Corpus.zip(Seq(
      "archive/data.warc" -> sampleWarc,
      "archive/data2.warc.gz" -> Corpus.gzipBytes(sampleWarc),
      "pages/pages.jsonl" -> "{\"url\":\"http://example.com/\"}\n".getBytes(UTF_8)))
    val out = Extractor.extract(DocRow("wz1",
      Seq(Span("zip", Corpus.b64(wacz), null, 0))))
    assert(out.status == Status.ParseSuccess)
    // both warc members parsed: 2 html + 2 txt responses extracted
    val text = out.spans.filter(_.kind == "text").map(_.text).mkString("\n")
    assert(text.split("warc body text", -1).length - 1 == 2, text.take(400))
    assert(out.meta("embedded:path").exists(_.endsWith(":archive/data.warc")))
    // the inner warc members carry their target URIs under nested paths
    assert(out.meta.keys.exists(k => k.startsWith("warc:/1/") &&
      k.endsWith("WARC-Target-URI")), out.meta.keys.filter(_.startsWith("warc")))
  }

  test("wacz detection: datapackage.json + archive/ specializes the zip") {
    // FrictionlessPackageDetector.java:75-106 — datapackage.json is
    // required; archive/ (or indexes/ + pages/) makes it a WACZ, a lone
    // datapackage.json is a frictionless data package
    val wacz = Corpus.zip(Seq(
      "datapackage.json" -> "{\"profile\":\"data-package\"}".getBytes(UTF_8),
      "archive/data.warc" -> sampleWarc))
    val out = Extractor.extract(DocRow("wz2",
      Seq(Span("zip", Corpus.b64(wacz), null, 0))))
    assert(out.mime == "application/x-wacz", out.mime)
    // supertype chain x-wacz -> datapackage+zip -> zip recurses members
    assert(out.status == Status.ParseSuccess)
    assert(out.meta("embedded:path").exists(_.endsWith(":archive/data.warc")),
      out.meta("embedded:path"))

    val pkg = Corpus.zip(Seq(
      "datapackage.json" -> "{\"profile\":\"data-package\"}".getBytes(UTF_8),
      "data/table.csv" -> "a,b\n1,2\n".getBytes(UTF_8)))
    val o2 = Extractor.extract(DocRow("wz3",
      Seq(Span("zip", Corpus.b64(pkg), null, 0))))
    assert(o2.mime == "application/x-vnd.datapackage+zip", o2.mime)
    assert(o2.status == Status.ParseSuccess)

    // indexes/ without pages/ is not enough — stays a plain zip
    val half = Corpus.zip(Seq(
      "datapackage.json" -> "{}".getBytes(UTF_8),
      "indexes/index.cdx" -> "cdx".getBytes(UTF_8)))
    val o3 = Extractor.extract(DocRow("wz4",
      Seq(Span("zip", Corpus.b64(half), null, 0))))
    assert(o3.mime == "application/zip", o3.mime)
  }

  test("non-http response body is the payload as-is") {
    val body = "raw resource bytes".getBytes(UTF_8)
    val rec = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://example.com/raw.txt\r\n" +
      "Content-Type: text/plain\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes(UTF_8) ++ body ++
      "\r\n\r\n".getBytes(UTF_8)
    val out = Extractor.extract(DocRow("w4",
      Seq(Span("bytes", Corpus.b64(rec), null, 0))))
    assert(out.status == Status.ParseSuccess)
    val text = out.spans.filter(_.kind == "text").map(_.text).mkString
    assert(text.contains("raw resource bytes"))
  }
}

/** Corpus v12 round-trip: the new kinds land in the engine with clean
  * statuses (warc + warc.gz rows, tar.bz2 rows, AES-256 pdf rows).
  */
class CorpusV12Spec extends org.scalatest.funsuite.AnyFunSuite {
  import graft.core.Status

  test("corpus warc rows: plain + gzipped both recurse") {
    val warcIdx = (0L until 1000L).filter(i => Corpus.kindOf(i) == "warc")
    assert(warcIdx.nonEmpty)
    val plain = warcIdx.find(_ % 2 == 0).get
    val gzipped = warcIdx.find(_ % 2 == 1).get
    val o1 = Extractor.extract(Corpus.row(plain))
    assert(o1.mime == "application/warc" && o1.status == Status.ParseSuccess,
      s"$plain -> ${o1.mime}/${o1.status}")
    assert(o1.spans.exists(_.kind == "embedded-open"))
    val o2 = Extractor.extract(Corpus.row(gzipped))
    assert(o2.mime == "application/gzip" && o2.status == Status.ParseSuccess)
    assert(o2.meta("embedded:/1") == Seq("application/warc"))
  }

  test("corpus tar.bz2 rows recurse through the bzip2 decoder") {
    val idx = (0L until 1000L)
      .filter(i => Corpus.kindOf(i) == "tar").filter(_ % 3 == 2)
    assert(idx.nonEmpty)
    val out = Extractor.extract(Corpus.row(idx.head))
    assert(out.mime == "application/x-bzip2", out.mime)
    assert(out.status == Status.ParseSuccess, out.status)
    assert(out.meta("embedded:/1") == Seq("application/x-tar"))
    assert(out.n_chars > 0)
  }

  test("corpus AES-256 pdf rows decrypt") {
    val idx = (0L until 1000L).filter(i => Corpus.kindOf(i) == "pdf")
      .filter(i => i % 11 == 7 && i % 13 != 4 && i % 11 != 3)
    assert(idx.nonEmpty)
    val out = Extractor.extract(Corpus.row(idx.head))
    assert(out.mime == graft.mime.MediaTypes.Pdf)
    assert(out.status == Status.ParseSuccess, out.status)
    assert(out.meta.contains("pdf:encrypted"))
    assert(out.n_chars > 0)
  }
}
