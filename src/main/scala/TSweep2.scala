object TSweep2 {
  def main(args: Array[String]): Unit = {
    import java.nio.file._
    import scala.jdk.CollectionConverters._
    val base = "/root/reference/tika-parsers/tika-parsers-standard/tika-parsers-standard-modules"
    val dirs = Seq(
      s"$base/tika-parser-webarchive-module/src/test/resources/test-documents",
      s"$base/tika-parser-image-module/src/test/resources/test-documents",
      s"$base/tika-parser-audiovideo-module/src/test/resources/test-documents",
      s"$base/tika-parser-pkg-module/src/test/resources/test-documents",
      s"$base/tika-parser-news-module/src/test/resources/test-documents",
      s"$base/tika-parser-font-module/src/test/resources/test-documents")
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    var n=0; var ok=0
    for (d <- dirs if Files.isDirectory(Path.of(d));
         p <- Files.list(Path.of(d)).iterator().asScala if Files.isRegularFile(p) && Files.size(p) < 20000000) {
      val name = p.getFileName.toString
      n += 1
      val b = Files.readAllBytes(p)
      val row = graft.core.DocRow(name, Seq(graft.core.Span("bytes", graft.corpus.Corpus.b64(b), null, 0)))
      val out = try graft.engine.Extractor.extract(row,
        graft.engine.Extractor.DefaultConfig.copy(maxEmbedded = 300)) catch { case e: Throwable => null }
      if (out == null) failures += s"CRASH $name"
      else out.status match {
        case "parse_exception" => failures += s"EXC   $name (${out.mime})"
        case _ => ok += 1
      }
    }
    println(s"swept $n files, ok-ish $ok")
    failures.foreach(f => println(f))
  }
}
