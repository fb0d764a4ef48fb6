package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.core.{DocRow, ExtractedDoc}
import graft.engine.{Extractor, Pipeline}

/** Structured Streaming face of the extraction pipeline.
  *
  * The reference's tika-pipes async loop is a bounded work queue, not an
  * unbounded stream (SURVEY.md §2.10) — but a 100 TB ingest is naturally
  * a continuous arrival problem, so the same per-row function is exposed
  * over `readStream`: new parquet files landing in the input directory
  * are detect→parsed incrementally with exactly-once sink semantics via
  * the checkpoint dir (the streaming analog of the lineage/resume table).
  * Stateless per row — no watermarks or state store needed.
  */
object StreamingPipeline {

  /** Incremental extraction over a file-source stream of DocRow parquet. */
  def extractStream(spark: SparkSession, inputDir: String,
      cfg: Extractor.Config = Extractor.DefaultConfig): Dataset[ExtractedDoc] = {
    import spark.implicits._
    val schema = spark.emptyDataset[DocRow].schema
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 32)
      .parquet(inputDir)
      .as[DocRow]
    stream.mapPartitions(it => it.map(row => Extractor.extract(row, cfg)))
  }

  /** Start the end-to-end streaming job: inputDir → extraction → outDir,
    * resumable from checkpointDir.
    */
  def run(spark: SparkSession, inputDir: String, outDir: String,
      checkpointDir: String, trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    extractStream(spark, inputDir).toDF()
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }
}
