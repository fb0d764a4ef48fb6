package graft

import org.apache.spark.sql.SparkSession

/** Extra benchmarks for the optimization rounds (guide §1.4): per-query
  * noop-sink isolation with N repetitions, and a q39 diagnostic that
  * prints the streaming microbatch duration breakdown. The contract
  * bench (graft.Bench) is frozen; numbers from here are cited in
  * OPTIMIZATION_r06.md only.
  *
  * Usage:
  *   runMain graft.BenchExtra queries <sfDir> <reps> <name1,name2,...>
  *   runMain graft.BenchExtra q39diag <sfDir>
  */
object BenchExtra {

  private def session(): SparkSession = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = args(0) match {
    case "queries" =>
      val sfDir = args(1)
      val reps = args(2).toInt
      val names = args(3).split(",").toSeq
      val spark = session()
      for (name <- names) {
        val times = (1 to reps).map { _ =>
          spark.sparkContext.setJobDescription(s"benchextra: $name")
          val t0 = System.nanoTime()
          SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[benchextra] $name: min=${times.min}%.3f " +
          f"samples=${times.map(t => f"$t%.3f").mkString(",")}")
      }
      spark.stop()

    case "q39diag" =>
      val sfDir = args(1)
      val spark = session()
      val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit =
          println(s"[q39diag] query started ${System.nanoTime() / 1e9}")
        override def onQueryProgress(e: QueryProgressEvent): Unit =
          println(s"[q39diag] progress: batch=${e.progress.batchId} " +
            s"rows=${e.progress.numInputRows} durationMs=${e.progress.durationMs}")
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
          println(s"[q39diag] terminated ${System.nanoTime() / 1e9}")
      }
      spark.streams.addListener(listener)
      (1 to 2).foreach { rep =>
        val t0 = System.nanoTime()
        SparkEntry.queries("q39_stream_sessionize")(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        println(f"[q39diag] rep$rep total ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      spark.stop()
  }
}
