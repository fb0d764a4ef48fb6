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

  private val Usage =
    """usage: runMain graft.BenchExtra queries <sfDir> <reps> <name1,name2,...>
      |       runMain graft.BenchExtra jobdiag <sfDir> <queryName>
      |       runMain graft.BenchExtra q39diag <sfDir>
      |       runMain graft.BenchExtra cpuprof <nDocs> [kind]""".stripMargin

  def main(args: Array[String]): Unit = args.headOption.getOrElse("") match {
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

    case "cpuprof" =>
      // single-threaded extraction with a poor-man's stack sampler:
      // counts the leaf-most graft frame (and the JVM leaf) every ~2 ms
      // to find per-doc hot spots without an external profiler.
      // Usage: cpuprof <nDocs> [kind]
      val n = args(1).toLong
      val kindFilter = if (args.length > 2) Some(args(2)) else None
      val ids = (0L until 400000L).iterator
        .filter(i => kindFilter.forall(k => graft.corpus.Corpus.kindOf(i) == k))
        .take(n.toInt).toArray
      // warmup for JIT
      ids.take(math.min(ids.length, 2000)).foreach(i =>
        graft.engine.Extractor.extract(graft.corpus.Corpus.row(i)))
      val worker = new Thread(() => {
        var j = 0
        while (j < ids.length) {
          graft.engine.Extractor.extract(graft.corpus.Corpus.row(ids(j)))
          j += 1
        }
      })
      val graftCounts = scala.collection.mutable.Map[String, Int]()
      val leafCounts = scala.collection.mutable.Map[String, Int]()
      val t0 = System.nanoTime()
      worker.start()
      while (worker.isAlive) {
        val st = worker.getStackTrace
        if (st.nonEmpty) {
          st.find(f => f.getClassName.startsWith("graft")).foreach { f =>
            val key = f.getClassName + "." + f.getMethodName + ":" + f.getLineNumber
            graftCounts(key) = graftCounts.getOrElse(key, 0) + 1
          }
          val leaf = st.head.getClassName + "." + st.head.getMethodName
          leafCounts(leaf) = leafCounts.getOrElse(leaf, 0) + 1
          if (leaf.startsWith("java.util.regex")) {
            st.find(f => f.getClassName.startsWith("graft")).foreach { f =>
              val key = "regex<- " + f.getClassName + "." + f.getMethodName +
                ":" + f.getLineNumber
              leafCounts(key) = leafCounts.getOrElse(key, 0) + 1
            }
          }
        }
        Thread.sleep(2)
      }
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[cpuprof] ${ids.length} docs in $wall%.2f s = ${ids.length / wall}%.0f docs/s (1 thread)")
      println("[cpuprof] --- leaf-most graft frames ---")
      graftCounts.toSeq.sortBy(-_._2).take(30).foreach { case (f, c) =>
        println(s"[cpuprof] $c $f") }
      println("[cpuprof] --- JVM leaf frames ---")
      leafCounts.toSeq.sortBy(-_._2).take(15).foreach { case (f, c) =>
        println(s"[cpuprof] leaf $c $f") }

    case "jobdiag" =>
      // per-Spark-job wall times for one query: which phase of a
      // multi-job operator (e.g. the q35 label-propagation loop) the
      // time actually goes to
      val sfDir = args(1)
      val name = args(2)
      val spark = session()
      // java.lang.Long values so a missing entry surfaces as null
      // instead of an unboxing NPE (job-start events can be dropped
      // under listener-bus load)
      val jobs = new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Long]()
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            jobs.put(e.jobId, System.nanoTime())
          override def onJobEnd(
              e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val t0 = jobs.remove(e.jobId) // null when the start event was dropped
            if (t0 != null)
              println(f"[jobdiag] job=${e.jobId} ${(System.nanoTime() - t0) / 1e6}%.0f ms")
          }
        })
      (1 to 2).foreach { rep =>
        println(s"[jobdiag] === rep $rep ===")
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        println(f"[jobdiag] rep$rep total ${(System.nanoTime() - t0) / 1e9}%.2f s")
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

    case other =>
      System.err.println(
        (if (other.isEmpty) "missing subcommand" else s"unknown subcommand '$other'") +
          "\n" + Usage)
      sys.exit(2)
  }
}
