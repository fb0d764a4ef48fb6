package graft.engine

import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.{DataFrame, Dataset}
import graft.core.{DocRow, Span}
import graft.mime.{MediaTypes, MimeRegistry}
import graft.zipx.{OpcDetector, ZipUtil}

/** The `/unpack` path: emit every embedded resource's raw bytes as its
  * own output row (reference: tika-pipes UnpackExtractor /
  * tika-server UnpackerResource — SURVEY.md §2.10 "optional second
  * output table of extracted media blobs").
  *
  * Walks the same container tree as the extraction engine (zip, tar,
  * 7z, ar/deb/cpio, warc, all codec wrappers, OOXML-as-zip media parts,
  * email attachments) but collects bytes instead of parsing them.
  * Per-row caps mirror the extraction config.
  */
object Unpack {

  final case class EmbeddedBlob(
      doc_id: String, id_path: String, name: String, mime: String,
      n_bytes: Long, sha256: String, truncated: Boolean, bytes: Array[Byte])

  final case class Config(maxDepth: Int = 10, maxEmbedded: Int = 100,
      maxBlobBytes: Int = 16 * 1024 * 1024, keepBytes: Boolean = true)

  def unpackDoc(row: DocRow, cfg: Config = Config()): Vector[EmbeddedBlob] = {
    val out = new ArrayBuffer[EmbeddedBlob]()
    var count = 0

    def digest(b: Array[Byte]): String =
      graft.core.Hex.encode(
        java.security.MessageDigest.getInstance("SHA-256").digest(b))

    def emit(idPath: String, name: String, data: Array[Byte]): Unit = {
      val truncated = data.length > cfg.maxBlobBytes
      val trimmed = if (truncated) java.util.Arrays.copyOf(data, cfg.maxBlobBytes)
                    else data
      // sha256 always covers the FULL content so it joins against
      // full-content hashes; `truncated` flags that `bytes` is a prefix
      out += EmbeddedBlob(row.doc_id, idPath, name,
        MimeRegistry.detect(trimmed, Option(name)), data.length.toLong,
        digest(data), truncated,
        if (cfg.keepBytes) trimmed else Array.emptyByteArray)
    }

    def walk(bytes: Array[Byte], idPath: String, nameHint: Option[String],
        depth: Int): Unit = {
      if (bytes.isEmpty || depth >= cfg.maxDepth || count >= cfg.maxEmbedded) return
      val mime0 = MimeRegistry.detect(bytes, nameHint)
      val mime =
        if (mime0 == MediaTypes.Zip || mime0 == MediaTypes.TikaOoxml)
          try OpcDetector.specialize(bytes, nameHint)
          catch { case _: Exception => mime0 }
        else mime0
      mime match {
        case MediaTypes.Zip | MediaTypes.Epub =>
          try ZipUtil.entries(bytes).foreach { e =>
            if (count < cfg.maxEmbedded) {
              count += 1
              val childPath = s"$idPath/$count"
              emit(childPath, e.name, e.data)
              walk(e.data, childPath, Some(e.name), depth + 1)
            }
          } catch { case _: Exception => () }
        case m if m == MediaTypes.Gzip || m == graft.mime.MimeDb.Bzip2 ||
            m == graft.mime.MimeDb.Xz || m == graft.mime.MimeDb.Lz4 ||
            m == graft.mime.MimeDb.Zstd || m == graft.mime.MimeDb.UnixCompress =>
          try {
            val inner =
              if (m == MediaTypes.Gzip) ZipUtil.gunzip(bytes)
              else if (m == graft.mime.MimeDb.Xz) graft.pkgx.Xz.decompress(bytes)
              else if (m == graft.mime.MimeDb.Lz4) graft.pkgx.Lz4.decompress(bytes)
              else if (m == graft.mime.MimeDb.Zstd) graft.pkgx.Zstd.decompress(bytes)
              else if (m == graft.mime.MimeDb.UnixCompress)
                graft.pkgx.Lzw.decompress(bytes)
              else graft.pkgx.Bzip2.decompress(bytes)
            count += 1
            val childPath = s"$idPath/$count"
            emit(childPath, nameHint.map(_ + "~unc").getOrElse("unc"), inner)
            walk(inner, childPath, None, depth + 1)
          } catch { case _: Exception => () }
        case m if m == graft.mime.MimeDb.Tar || m == graft.mime.MimeDb.Gtar =>
          try graft.pkgx.TarUtil.entries(bytes).foreach { e =>
            if (count < cfg.maxEmbedded) {
              count += 1
              val childPath = s"$idPath/$count"
              emit(childPath, e.name, e.data)
              walk(e.data, childPath, Some(e.name), depth + 1)
            }
          } catch { case _: Exception => () }
        case m if m == graft.mime.MimeDb.SevenZ =>
          try graft.pkgx.SevenZ.entries(bytes).foreach { e =>
            if (count < cfg.maxEmbedded) {
              count += 1
              val childPath = s"$idPath/$count"
              emit(childPath, e.name, e.data)
              walk(e.data, childPath, Some(e.name), depth + 1)
            }
          } catch { case _: Exception => () }
        case m if m == graft.mime.MimeDb.Ar || m == graft.mime.MimeDb.Deb ||
            m == graft.mime.MimeDb.Cpio =>
          try {
            val entries =
              if (m == graft.mime.MimeDb.Cpio) graft.pkgx.ArCpio.cpioEntries(bytes)
              else graft.pkgx.ArCpio.arEntries(bytes)
            entries.foreach { e =>
              if (count < cfg.maxEmbedded) {
                count += 1
                val childPath = s"$idPath/$count"
                emit(childPath, e.name, e.data)
                walk(e.data, childPath, Some(e.name), depth + 1)
              }
            }
          } catch { case _: Exception => () }
        case m if m == graft.mime.MimeDb.Warc =>
          try graft.warc.WarcExtractor.records(bytes)
            .filter(r => r.warcType == "response" && r.body.nonEmpty)
            .foreach { rec =>
              if (count < cfg.maxEmbedded) {
                count += 1
                val childPath = s"$idPath/$count"
                val payload = graft.warc.WarcExtractor.parseHttpHead(rec.body)
                  .map(h => java.util.Arrays.copyOfRange(rec.body,
                    h.payloadOffset, rec.body.length))
                  .getOrElse(rec.body)
                val name = rec.targetUri.getOrElse(s"record-$count")
                emit(childPath, name, payload)
                walk(payload, childPath, Some(name), depth + 1)
              }
            } catch { case _: Exception => () }
        case MediaTypes.Eml =>
          try graft.mail.EmlExtractor.extract(bytes, new SpanSink(), new MetaSink,
            (name, data) => {
              if (count < cfg.maxEmbedded) {
                count += 1
                val childPath = s"$idPath/$count"
                emit(childPath, name.getOrElse(s"attachment-$count"), data)
                walk(data, childPath, name, depth + 1)
              }
            }) catch { case _: Exception => () }
        case _ => () // leaf: nothing further to unpack
      }
    }

    row.spans.sortBy(_.offset).foreach { s =>
      if (s.kind != Span.KindMedia) walk(Extractor.payloadBytes(s), "", None, 0)
    }
    out.toVector
  }

  /** Dataset face: one row per embedded resource. */
  def unpack(ds: Dataset[DocRow], cfg: Config = Config()): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.flatMap(row => unpackDoc(row, cfg))).toDF()
  }
}
