/** Gap sweep over the reference's full fixture corpus (test scope only):
  * aggregates extraction status x mime so remaining unsupported/exception
  * formats surface with counts and example files. Run:
  *   sbt 'Test/runMain SweepGap'
  */
object SweepGap {
  def main(args: Array[String]): Unit = {
    import java.nio.file._
    import scala.jdk.CollectionConverters._
    val base = Path.of("/root/reference")
    if (!Files.isDirectory(base)) { println("no reference tree"); return }
    val dirs = Files.walk(base).iterator().asScala
      .filter(p => Files.isDirectory(p) && p.getFileName.toString == "test-documents")
      .toVector
    val agg = scala.collection.mutable.Map[(String, String), (Int, List[String])]()
    var n = 0
    for (d <- dirs; p <- Files.walk(d).iterator().asScala
           if Files.isRegularFile(p) && Files.size(p) < 20000000) {
      val name = p.getFileName.toString
      n += 1
      val b = Files.readAllBytes(p)
      val row = graft.core.DocRow(name,
        Seq(graft.core.Span("bytes", graft.corpus.Corpus.b64(b), null, 0)))
      val out = try graft.engine.Extractor.extract(row,
        graft.engine.Extractor.DefaultConfig.copy(maxEmbedded = 300))
        catch { case e: Throwable =>
          graft.core.ExtractedDoc(name, "CRASH:" + e.getClass.getSimpleName,
            "crash", Nil, Map.empty, 0, 0) }
      val key = (out.status, out.mime)
      val (c, ex) = agg.getOrElse(key, (0, Nil))
      agg(key) = (c + 1, if (ex.size < 4) name :: ex else ex)
      args.collectFirst { case a if a.startsWith("--mime=") => a.drop(7) }
        .foreach(m => if (out.mime == m) println(s"FILE ${out.status} $p"))
    }
    println(s"swept $n files")
    for (((status, mime), (c, ex)) <- agg.toSeq.sortBy { case ((s, _), (c, _)) => (s, -c) }
         if status != "parse_success" || args.contains("--all"))
      println(f"$status%-22s $mime%-55s $c%5d  ${ex.mkString(", ")}")
    val succ = agg.collect { case ((s, _), (c, _)) if s == "parse_success" => c }.sum
    println(s"parse_success: $succ / $n")
  }
}
