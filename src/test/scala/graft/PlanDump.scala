object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    for (name <- args) {
      println(s"===== $name")
      val df = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode))
    }
    spark.stop()
  }
}
