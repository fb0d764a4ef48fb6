package graft

import org.apache.spark.sql.SparkSession
import graft.corpus.Corpus
import graft.engine.Pipeline

/** Ad-hoc profiling main: generation-only vs full extraction at a given
  * parallelism. Usage: runMain graft.Profile <cores> <docs>
  */
object Profile {
  /** Mode 2: runMain graft.Profile scan <cores> <corpusDir> — time the
    * scan→extract job over a pre-materialized parquet corpus.
    */
  def scanMain(cores: Int, dir: String): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_SPLIT", "8m"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val input = spark.read.parquet(dir).as[graft.core.DocRow]
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      Pipeline.extract(input).toDF().write.format("noop").mode("overwrite").save()
      println(f"[profile] scan-extract-$cores-run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }

  /** Mode 3: runMain graft.Profile queries <cores> <sfDir> <name1,name2,...>
    * — time named contract queries (twice each, noop sink).
    */
  def queriesMain(cores: Int, sfDir: String, names: Seq[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (rep <- 1 to 2; name <- names) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[profile] $name-run$rep: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    if (args(0) == "scan") { scanMain(args(1).toInt, args(2)); return }
    if (args(0) == "queries") {
      queriesMain(args(1).toInt, args(2), args(3).split(",").toSeq); return
    }
    val cores = args(0).toInt
    val docs = args(1).toLong
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    time("warmup-5k")(Pipeline.extract(Corpus.docRows(spark, 5000, cores * 4))
      .toDF().write.format("noop").mode("overwrite").save())
    time(s"generate-only-$docs")(
      Corpus.docRows(spark, docs, cores * 4).toDF()
        .write.format("noop").mode("overwrite").save())
    time(s"extract-$docs")(
      Pipeline.extract(Corpus.docRows(spark, docs, cores * 4)).toDF()
        .write.format("noop").mode("overwrite").save())
    // per-kind cost: one partition per kind family
    Seq("html", "docx", "pdf", "zip", "text", "xml").foreach { kind =>
      val ids = (0L until 200000L).filter(i => Corpus.kindOf(i) == kind).take(20000)
      time(f"extract-20k-$kind") {
        spark.sparkContext.parallelize(ids, cores * 4)
          .map(i => graft.engine.Extractor.extract(Corpus.row(i)).n_chars)
          .sum()
      }
    }
    spark.stop()
  }
}
