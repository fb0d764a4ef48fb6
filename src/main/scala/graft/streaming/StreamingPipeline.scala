package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StreamingQuery, Trigger}
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
  * The extraction itself is stateless per row; the event-time layer on
  * top adds watermarked windowed aggregation ([[windowedMimeCounts]])
  * and explicit-state sessionization via `flatMapGroupsWithState`
  * ([[sessionize]]).
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

  // ---- event-time analytics over a document/event stream ---------------

  /** Watermarked tumbling-window per-mime throughput: counts of
    * extracted docs per (window, mime), tolerating `lateness` of event
    * skew before a window finalizes. The streaming analog of the metrics
    * table's per-batch counts.
    */
  def windowedMimeCounts(extracted: DataFrame, eventTimeCol: String,
      window_ : String = "1 minute", lateness: String = "2 minutes"): DataFrame =
    extracted
      .withWatermark(eventTimeCol, lateness)
      .groupBy(window(col(eventTimeCol), window_), col("mime"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))

  final case class SessionState(nEvents: Long, firstTs: Long, lastTs: Long)
  final case class SessionOut(user_id: Long, n_events: Long,
      start_ts: Timestamp, end_ts: Timestamp, duration_ms: Long)

  /** Streaming sessionization with explicit state: per-user sessions
    * close after `gapMs` of event-time inactivity, maintained via
    * `flatMapGroupsWithState` + processing-time timeout — the custom-
    * state shape the batch q05 sessionize mirrors. Input rows:
    * (user_id: Long, ts: Timestamp).
    */
  def sessionize(events: Dataset[(Long, Timestamp)],
      gapMs: Long = 30 * 60 * 1000L): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout())(
        sessionStep(gapMs))
  }

  /** The per-group state transition, exposed for direct unit testing via
    * `TestGroupState` (timeout firing depends on wall-clock trigger
    * scheduling, which a deterministic test cannot wait on).
    */
  def sessionStep(gapMs: Long)(user: Long, rows: Iterator[(Long, Timestamp)],
      state: GroupState[SessionState]): Iterator[SessionOut] = {
    if (state.hasTimedOut) {
      // idle user: flush the open session
      val s = state.get
      state.remove()
      Iterator.single(SessionOut(user, s.nEvents,
        new Timestamp(s.firstTs), new Timestamp(s.lastTs),
        s.lastTs - s.firstTs))
    } else {
      val ts = rows.map(_._2.getTime).toVector.sorted
      val out = Vector.newBuilder[SessionOut]
      var cur = state.getOption
      ts.foreach { t =>
        cur match {
          case Some(s) if t - s.lastTs <= gapMs =>
            // min/max, not assignment: events are only sorted WITHIN a
            // batch — a late cross-batch event must never regress lastTs
            // (negative durations) or it would fake a gap for the next
            // on-time event
            cur = Some(SessionState(s.nEvents + 1,
              math.min(s.firstTs, t), math.max(s.lastTs, t)))
          case Some(s) => // gap exceeded: close and start fresh
            out += SessionOut(user, s.nEvents, new Timestamp(s.firstTs),
              new Timestamp(s.lastTs), s.lastTs - s.firstTs)
            cur = Some(SessionState(1, t, t))
          case None => cur = Some(SessionState(1, t, t))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutDuration(gapMs)
      }
      out.result().iterator
    }
  }
}
