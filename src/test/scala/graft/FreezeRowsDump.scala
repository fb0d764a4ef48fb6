/** Dev tool: regenerate the frozen ROW-LEVEL oracle resources
  * (src/main/resources/frozen/x01/x02/x05/x06_rows.tsv) from a fresh
  * sf0.01 extraction after an INTENTIONAL corpus/extractor change. Each
  * line is one pre-quoted SQL VALUES tuple; SparkEntry.frozenRowsOracle
  * splices them into the oracle SQL. Run:
  *   sbt 'Test/runMain FreezeRowsDump'
  */
object FreezeRowsDump {

  private def sqlTuple(values: Seq[Any]): String =
    values.map {
      case null => "NULL"
      case s: String => "'" + s.replace("'", "''") + "'"
      case x => String.valueOf(x)
    }.mkString("(", ", ", ")")

  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    val outDir = java.nio.file.Path.of("src/main/resources/frozen")
    java.nio.file.Files.createDirectories(outDir)
    for (name <- Seq("x01_extract_all", "x02_spans_flat",
        "x05_embedded_tree", "x06_unpack",
        "x04_html_main_content", "x07_rmeta", "q24_projections")) {
      val rows = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
        .collect()
        .map(r => sqlTuple(r.toSeq))
        .sorted
      val file = outDir.resolve(name.take(3) + "_rows.tsv")
      java.nio.file.Files.writeString(file, rows.mkString("\n") + "\n")
      println(s"wrote ${rows.length} tuples to $file")
    }
    spark.stop()
  }
}
