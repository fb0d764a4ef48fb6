/** Dev tool: extract named reference fixtures and dump text/meta.
  * Usage: Test/runMain Fx <fixture-file-name> [more...]
  */
object Fx {
  def main(args: Array[String]): Unit = {
    import java.nio.file._
    import scala.jdk.CollectionConverters._
    val all = Files.walk(Path.of("/root/reference")).iterator().asScala
      .filter(p => Files.isRegularFile(p)).toVector
    for (a <- args;
         p <- (if (a.startsWith("/")) Seq(Path.of(a))
               else all.filter(_.getFileName.toString == a).take(1))) {
      val b = Files.readAllBytes(p)
      val row = graft.core.DocRow(a,
        Seq(graft.core.Span("bytes", graft.corpus.Corpus.b64(b), null, 0)))
      val out = graft.engine.Extractor.extract(row,
        graft.engine.Extractor.DefaultConfig.copy(maxEmbedded = 300))
      println(s"=== $a  mime=${out.mime} status=${out.status} spans=${out.n_spans}")
      out.meta.toSeq.sortBy(_._1).foreach { case (k, v) =>
        println(s"  M $k = ${v.mkString(" | ").take(160)}") }
      out.spans.take(60).foreach { s =>
        val raw = if (s.text == null) ""
          else s.text.replace("\n", "\\n").replace("\r", "\\r").take(200)
        val t = raw.flatMap(c => if (c < 127) c.toString else f"\\u${c.toInt}%04x")
        println(s"  S ${s.kind} ${Option(s.media_ref).getOrElse("")} $t")
      }
    }
  }
}
