/** Dev tool: print fresh sf0.01 rows for frozen-table oracles as SQL
  * VALUES tuples, for pasting into SparkEntry.oracleSql after an
  * intentional corpus/extractor change. Run:
  *   sbt 'Test/runMain FreezeDump x08_media_meta x09_span_stats ...'
  */
object FreezeDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    for (name <- args) {
      val rows = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
        .collect()
      println(s"=== $name (${rows.length} rows)")
      rows.map { r =>
        r.toSeq.map {
          case null => "NULL"
          case s: String => "'" + s.replace("'", "''") + "'"
          case d: Double => d.toString
          case x => String.valueOf(x)
        }.mkString("(", ", ", ")")
      }.sorted.foreach(t => println("FREEZE " + t + ","))
    }
    spark.stop()
  }
}
