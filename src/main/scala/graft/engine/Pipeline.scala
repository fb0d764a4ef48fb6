package graft.engine

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._

/** The Dataset-level extraction pipeline — the reference's tika-pipes
  * fetch→parse→emit loop (tika-pipes/.../async/AsyncProcessor.java:64-513)
  * re-expressed as Spark stages:
  *
  *  - the table scan IS the PipesIterator (partition = work queue);
  *  - one typed `mapPartitions` runs detect+parse per row (parser state
  *    initialized once per partition, mirroring Tika's parser reuse —
  *    parser/Parser.java thread-safety contract);
  *  - per-partition lineage rows (doc_id ranges, parser version, span
  *    counts, wall time) are the resume checkpoint (PipesReporter / the
  *    north rule's Iceberg metrics table);
  *  - skew: oversized docs are spread by hash-repartitioning on doc_id
  *    before the parse stage (salting); AQE coalesces small partitions.
  *
  * At 100 TB the input is a partitioned Parquet/Iceberg table: Catalyst
  * prunes to the (doc_id, spans) columns, and the resume filter is a
  * partition-prunable range predicate.
  */
object Pipeline {

  /** Core transform: detect→parse→spans, no shuffle. */
  def extract(ds: Dataset[DocRow],
      cfg: Extractor.Config = Extractor.DefaultConfig): Dataset[ExtractedDoc] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition init happens here (registry is a JVM-singleton; at
      // cluster scale it would be a broadcast value — see extractSalted)
      it.map(row => Extractor.extract(row, cfg))
    }
  }

  /** Skew-aware variant: estimate payload weight, spread heavy rows
    * uniformly across `numPartitions` before parsing (salting; SURVEY.md
    * §4 "salting of oversized-document partitions").
    */
  def extractSalted(ds: Dataset[DocRow], numPartitions: Int,
      cfg: Extractor.Config = Extractor.DefaultConfig): Dataset[ExtractedDoc] = {
    import ds.sparkSession.implicits._
    // hash-spread on doc_id: oversized docs generated in runs (or packed
    // into the same input file) land on distinct partitions
    val spread = ds.repartition(numPartitions, col("doc_id"))
    extract(spread, cfg)
  }

  /** Output schema with the physical partition id for lineage. */
  def extractWithPartitionId(ds: Dataset[DocRow],
      cfg: Extractor.Config = Extractor.DefaultConfig): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      it.map { row =>
        val d = Extractor.extract(row, cfg)
        (pid, d.doc_id, d.mime, d.status, d.spans, d.meta, d.n_spans, d.n_chars)
      }
    }.toDF("partition_id", "doc_id", "mime", "status", "spans", "meta",
      "n_spans", "n_chars")
  }

  /** End-to-end job: extract → write output table → append per-partition
    * lineage/metrics. Idempotent per run; see [[resumeFilter]].
    */
  def run(spark: SparkSession, input: Dataset[DocRow], outDir: String,
      metricsDir: String, numPartitions: Int = 32,
      cfg: Extractor.Config = Extractor.DefaultConfig): Unit =
    writeWithMetrics(spark,
      extractWithPartitionId(
        input.repartition(numPartitions, col("doc_id")), cfg),
      outDir, metricsDir)

  /** Write output + per-partition lineage. Each run lands in its own
    * `run_id=<uuid>/` partition directory, so the lineage aggregation
    * reads back ONLY this run's committed files — O(this run), never
    * O(all data ever written) (the same scale bug fixed in BucketedRun's
    * manifest this round), and it is exactly what the sink committed.
    * (Aggregating a cached pre-write frame instead is unsound here: the
    * append invalidates any cached plan that references outDir — e.g. a
    * resume anti-join input — and the recompute re-lists the directory
    * it just wrote to.) Readers of outDir get `run_id` back via
    * partition discovery. Metrics are written only after the data write
    * commits, so a failed run leaves no lineage row.
    *
    * Layout note: outDir uses Hive-style `run_id=` directories from this
    * version on; an outDir written by the flat pre-run_id layout cannot
    * be appended to (Spark partition discovery rejects mixed depths,
    * loudly) — resume into a fresh directory instead of mixing layouts.
    */
  private def writeWithMetrics(spark: SparkSession,
      extracted: DataFrame, outDir: String, metricsDir: String): Unit = {
    import spark.implicits._
    // Legacy-layout guard: an outDir written by the flat pre-run_id
    // layout (parquet files at the top level) cannot take a run_id=
    // append — partition discovery would fail at READ time with an
    // inscrutable mixed-depth error. Fail the write with an explicit
    // migration message instead (see FIXTURES.md "Output layout").
    val hPath = new org.apache.hadoop.fs.Path(outDir)
    val hFs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (hFs.exists(hPath) &&
        hFs.listStatus(hPath).exists(st =>
          st.isFile && st.getPath.getName.endsWith(".parquet")))
      throw new IllegalStateException(
        s"outDir $outDir holds a legacy flat (pre-run_id) layout; " +
          "write this run into a fresh directory — mixing layouts breaks " +
          "partition discovery for every reader")
    val t0 = System.currentTimeMillis()
    val runId = java.util.UUID.randomUUID().toString
    extracted.withColumn("run_id", lit(runId))
      .write.mode("append").partitionBy("run_id").parquet(outDir)
    val wall = System.currentTimeMillis() - t0
    // an empty input (fully-resumed rerun) writes no rows and therefore
    // no run directory — a no-op run adds no lineage row. ONLY the
    // missing-path case may be swallowed: any other failure must
    // surface, or a committed run would silently lack its lineage row
    // and later resumes would re-extract it.
    val committed =
      try spark.read.parquet(s"$outDir/run_id=$runId")
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("PATH_NOT_FOUND") => return
      }
    val metrics = committed
      .groupBy($"partition_id")
      .agg(
        min($"doc_id").as("doc_id_min"), max($"doc_id").as("doc_id_max"),
        count(lit(1)).as("n_docs"), sum($"n_spans").as("n_spans"),
        sum($"n_chars").as("n_chars"),
        sum(when($"status".startsWith("parse_success"), 1L).otherwise(0L))
          .as("n_success"),
        sum(when($"status".startsWith("parse_success"), 0L).otherwise(1L))
          .as("n_failed"))
      .withColumn("run_id", lit(runId))
      .withColumn("parser_version", lit(Model.ParserVersion))
      .withColumn("wall_ms", lit(wall))
    metrics.write.mode("append").parquet(metricsDir)
  }

  /** Per-partition wall-time instrumentation: runs the full extraction on
    * each partition and emits one timing row per partition — the
    * max/median spread is the skew evidence the bench reports
    * (BASELINE.md "max/median partition wall time before and after
    * salting").
    */
  def partitionTimings(ds: Dataset[DocRow],
      cfg: Extractor.Config = Extractor.DefaultConfig): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      val t0 = System.nanoTime()
      var n = 0L
      var chars = 0L
      while (it.hasNext) {
        val d = Extractor.extract(it.next(), cfg)
        n += 1
        chars += d.n_chars
      }
      Iterator.single((pid, n, chars, (System.nanoTime() - t0) / 1000000))
    }.toDF("partition_id", "n_docs", "n_chars", "wall_ms")
  }

  /** Resume: drop rows already present in the committed output
    * (left-anti on doc_id — at Iceberg scale this becomes a partition-
    * prunable doc_id-range predicate from the metrics table; the anti-join
    * broadcast-builds on the *done* side only when it is small).
    */
  def resumeFilter(input: Dataset[DocRow], outDir: String): Dataset[DocRow] = {
    val spark = input.sparkSession
    import spark.implicits._
    val done =
      try spark.read.parquet(outDir).select("doc_id").distinct()
      catch { case _: Exception => return input }
    input.join(done, Seq("doc_id"), "left_anti").as[DocRow]
  }

  /** Range-partitioned variant of [[run]]: partitions carry contiguous
    * doc_id ranges, so the lineage rows' (doc_id_min, doc_id_max) are
    * exact coverage intervals and [[resumeFilterByRange]] can resume with
    * a pure predicate instead of an anti-join.
    */
  def runRanged(spark: SparkSession, input: Dataset[DocRow], outDir: String,
      metricsDir: String, numPartitions: Int = 32,
      cfg: Extractor.Config = Extractor.DefaultConfig): Unit =
    writeWithMetrics(spark,
      extractWithPartitionId(
        input.repartitionByRange(numPartitions, col("doc_id")), cfg),
      outDir, metricsDir)

  /** Resume as a partition-prunable range predicate (the variant the
    * round-1 comment promised): committed (doc_id_min, doc_id_max)
    * intervals from the metrics table are merged on the driver (tiny —
    * one per committed partition) and compiled into a NOT-in-any-range
    * filter. No shuffle, no join; Parquet/Iceberg min-max stats prune
    * whole input files; O(done) work in [[resumeFilter]] drops to
    * O(committed partitions).
    *
    * NOT a drop-in equivalent of the anti-join: a committed interval is
    * treated as FULLY covered, so any doc_id that sorts inside
    * [min, max] of a committed partition is skipped even if that exact
    * id was never extracted. Correct for the append-only ingest layout
    * this targets (monotone doc_id batches written by [[runRanged]]);
    * for inputs with late-arriving/backfilled ids inside committed
    * ranges, use [[resumeFilter]].
    */
  def resumeFilterByRange(input: Dataset[DocRow], metricsDir: String): Dataset[DocRow] = {
    val spark = input.sparkSession
    import spark.implicits._
    val intervals =
      try spark.read.parquet(metricsDir)
        .select("doc_id_min", "doc_id_max")
        .collect()
        .map(r => (r.getString(0), r.getString(1)))
        .sortBy(_._1)
      catch { case _: Exception => return input }
    if (intervals.isEmpty) return input
    // merge overlapping/adjacent intervals (doc ids are fixed-width, so
    // lexicographic order == numeric order)
    val merged = intervals.foldLeft(List.empty[(String, String)]) {
      case ((lo, hi) :: rest, (lo2, hi2)) if lo2 <= hi =>
        (lo, if (hi2 > hi) hi2 else hi) :: rest
      case (acc, iv) => iv :: acc
    }.reverse
    val covered = merged
      .map { case (lo, hi) => col("doc_id").between(lo, hi) }
      .reduce(_ || _)
    input.filter(!covered).as[DocRow]
  }
}
