/** Dev audit: fixtures that parse clean but emit ZERO text.
  *
  * The robustness sweep catches crashes; this catches the quieter
  * failure mode (ADVICE r3: BIFF2 sheets "extracted" as empty
  * parse_success) — a file >1 KB whose whole recursion tree yields no
  * text span and no metadata is suspicious for a silently-unsupported
  * record layout. Grouped by mime so one gap = one line.
  */
object EmptyAudit {
  def main(args: Array[String]): Unit = {
    import java.nio.file._
    import scala.jdk.CollectionConverters._
    val base = Path.of("/root/reference")
    val dirs = Files.walk(base).iterator().asScala
      .filter(p => Files.isDirectory(p) && p.getFileName.toString == "test-documents")
      .toVector
    val byMime = scala.collection.mutable.Map[String, scala.collection.mutable.ArrayBuffer[String]]()
    var n = 0
    for (d <- dirs; p <- Files.walk(d).iterator().asScala
           if Files.isRegularFile(p) && Files.size(p) < 20000000 && Files.size(p) > 1024) {
      val name = p.getFileName.toString
      n += 1
      val b = Files.readAllBytes(p)
      val row = graft.core.DocRow(name,
        Seq(graft.core.Span("bytes", graft.corpus.Corpus.b64(b), null, 0)))
      val out = try graft.engine.Extractor.extract(row,
        graft.engine.Extractor.DefaultConfig.copy(maxEmbedded = 300))
        catch { case _: Throwable => null }
      if (out != null && out.status == "parse_success") {
        val textChars = out.spans.iterator
          .filter(s => s.kind == "text" || s.kind == "title")
          .map(s => if (s.text == null) 0 else s.text.trim.length).sum
        val metaKeys = out.meta.size
        if (textChars == 0)
          byMime.getOrElseUpdate(s"${out.mime} meta=${metaKeys > 3}",
            scala.collection.mutable.ArrayBuffer()) += name
      }
    }
    println(s"audited $n files > 1KB; empty-text clean parses by mime:")
    byMime.toSeq.sortBy(-_._2.size).foreach { case (m, names) =>
      println(f"${names.size}%4d  $m  e.g. ${names.take(4).mkString(", ")}")
    }
  }
}
