package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingPipeline

/** Event-time streaming layer: watermarked window agg + explicit-state
  * sessionization (flatMapGroupsWithState).
  */
class StreamingStateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(minute: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:$sec%02d")

  test("watermarked tumbling window counts per mime") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Long)]
    val df = in.toDF().toDF("event_ts", "mime", "n_chars")
    val out = StreamingPipeline.windowedMimeCounts(df, "event_ts")
    val q = out.writeStream.format("memory").queryName("wmc")
      .outputMode(OutputMode.Append()).start()
    in.addData((ts(0), "text/html", 10L), (ts(0, 30), "text/html", 20L),
      (ts(1, 10), "application/pdf", 5L))
    q.processAllAvailable()
    // advance the watermark far enough to finalize the first windows
    in.addData((ts(10), "text/html", 1L))
    q.processAllAvailable()
    val rows = spark.sql("SELECT mime, n_docs, n_chars FROM wmc").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    q.stop()
    assert(rows.contains(("text/html", 2L, 30L)))   // minute-0 window
    assert(rows.contains(("application/pdf", 1L, 5L)))
  }

  test("flatMapGroupsWithState sessionization closes sessions at the gap") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp)]
    val sessions = StreamingPipeline.sessionize(in.toDS(), gapMs = 60 * 1000L)
    // all data before start + AvailableNow: one batch, then terminate.
    // (With a processing-time timeout registered, the default trigger
    // runs no-data batches continuously to check timers, so
    // processAllAvailable never observes an idle stream — the timeout
    // branch is covered deterministically by the TestGroupState test.)
    in.addData((1L, ts(0)), (1L, ts(0, 30)), (1L, ts(5)), (2L, ts(5)))
    val q = sessions.writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // AvailableNow with a processing-time timeout can keep scheduling
    // no-data timer batches; stop explicitly so a later session stop
    // never races a mid-flight micro-batch plan.
    q.stop()
    val closed = spark.sql("SELECT user_id, n_events, duration_ms FROM sess")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the first session of user 1 closed when the 10:05 event exceeded the gap
    assert(closed.contains((1L, 2L, 30000L)), closed.mkString(", "))
  }

  test("sessionStep state transitions incl. timeout flush (TestGroupState)") {
    import org.apache.spark.sql.streaming.TestGroupState
    import graft.streaming.StreamingPipeline.{SessionState, SessionOut}
    val step = StreamingPipeline.sessionStep(60 * 1000L) _
    // fresh state accumulates without emitting
    import org.apache.spark.api.java.Optional
    val s0 = TestGroupState.create[SessionState](Optional.empty[SessionState](),
      org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout(),
      batchProcessingTimeMs = 1000L, eventTimeWatermarkMs = Optional.empty[java.lang.Long]().asInstanceOf[Optional[Long]],
      hasTimedOut = false)
    val out0 = step(1L, Iterator((1L, ts(0)), (1L, ts(0, 30))), s0).toVector
    assert(out0.isEmpty)
    assert(s0.get.nEvents == 2)
    // a gap-exceeding event closes the session and restarts
    val s1 = TestGroupState.create[SessionState](Optional.of(s0.get),
      org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout(),
      batchProcessingTimeMs = 2000L, eventTimeWatermarkMs = Optional.empty[java.lang.Long]().asInstanceOf[Optional[Long]],
      hasTimedOut = false)
    val out1 = step(1L, Iterator((1L, ts(5))), s1).toVector
    assert(out1.map(o => (o.n_events, o.duration_ms)) == Vector((2L, 30000L)))
    assert(s1.get.nEvents == 1)
    // timeout: open session flushes and state clears
    val s2 = TestGroupState.create[SessionState](Optional.of(s1.get),
      org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout(),
      batchProcessingTimeMs = 3000L, eventTimeWatermarkMs = Optional.empty[java.lang.Long]().asInstanceOf[Optional[Long]],
      hasTimedOut = true)
    val out2 = step(1L, Iterator.empty, s2).toVector
    assert(out2.map(_.n_events) == Vector(1L))
    assert(s2.isRemoved)
  }

  test("sessionStep tolerates cross-batch out-of-order events") {
    import org.apache.spark.sql.streaming.TestGroupState
    import org.apache.spark.api.java.Optional
    import graft.streaming.StreamingPipeline.SessionState
    val step = StreamingPipeline.sessionStep(60 * 1000L) _
    def st(prev: Option[SessionState]) = TestGroupState.create[SessionState](
      prev.map(Optional.of[SessionState]).getOrElse(Optional.empty[SessionState]()),
      org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout(),
      batchProcessingTimeMs = 1000L,
      eventTimeWatermarkMs = Optional.empty[java.lang.Long]().asInstanceOf[Optional[Long]],
      hasTimedOut = false)
    // batch 1: event at 10:05; batch 2: LATE event at 10:04:30
    val s0 = st(None)
    step(1L, Iterator((1L, ts(5))), s0)
    val s1 = st(Some(s0.get))
    val late = step(1L, Iterator((1L, ts(4, 30))), s1).toVector
    assert(late.isEmpty) // within gap: merged, no close
    assert(s1.get.lastTs == ts(5).getTime)      // lastTs must NOT regress
    assert(s1.get.firstTs == ts(4, 30).getTime) // firstTs extends back
    // an on-time event 30s after the true last event stays in-session
    val s2 = st(Some(s1.get))
    val cont = step(1L, Iterator((1L, ts(5, 30))), s2).toVector
    assert(cont.isEmpty)
    assert(s2.get.nEvents == 3)
  }
}
