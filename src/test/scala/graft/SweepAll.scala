object SweepAll {
  def main(args: Array[String]): Unit = {
    import java.nio.file._
    import scala.jdk.CollectionConverters._
    val base = Path.of("/root/reference")
    val dirs = Files.walk(base).iterator().asScala
      .filter(p => Files.isDirectory(p) && p.getFileName.toString == "test-documents")
      .toVector
    var n = 0; var ok = 0; var excOk = 0
    val crashes = scala.collection.mutable.ArrayBuffer[String]()
    val slow = scala.collection.mutable.ArrayBuffer[String]()
    for (d <- dirs; p <- Files.walk(d).iterator().asScala
           if Files.isRegularFile(p) && Files.size(p) < 20000000) {
      val name = p.getFileName.toString
      n += 1
      val b = Files.readAllBytes(p)
      val row = graft.core.DocRow(name,
        Seq(graft.core.Span("bytes", graft.corpus.Corpus.b64(b), null, 0)))
      val t0 = System.nanoTime()
      val out = try graft.engine.Extractor.extract(row,
        graft.engine.Extractor.DefaultConfig.copy(maxEmbedded = 300))
        catch { case e: Throwable => crashes += s"CRASH $name: ${e.getClass.getSimpleName} ${e.getMessage}"; null }
      val ms = (System.nanoTime() - t0) / 1e6
      if (ms > 10000) slow += f"SLOW $name: $ms%.0f ms"
      if (out != null) out.status match {
        case "parse_exception" =>
          excOk += 1
          println(s"EXC $name (${out.mime})")
        case _ => ok += 1
      }
    }
    println(s"swept $n files: ok=$ok exceptions=$excOk crashes=${crashes.size}")
    crashes.foreach(println)
    slow.foreach(println)
  }
}
