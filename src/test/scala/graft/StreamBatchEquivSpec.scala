package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.Corpus
import graft.engine.Pipeline
import graft.streaming.StreamingPipeline

/** Stream/batch equivalence for the extraction face: the SAME corpus
  * rows driven through `StreamingPipeline.run` (file-source readStream,
  * AvailableNow, checkpointed parquet sink) must produce byte-identical
  * ordered span sequences, mime, status, and metadata to the batch
  * `Pipeline.extract` path — the streaming analog of the
  * span-determinism invariant. Also exercises exactly-once resume: a
  * second run over the same checkpoint emits nothing new.
  */
class StreamBatchEquivSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("availableNow streaming extraction equals batch extraction") {
    import spark.implicits._
    val n = 300L
    val tmp = Files.createTempDirectory("graft-stream-equiv")
    val inDir = tmp.resolve("in").toString
    val outDir = tmp.resolve("out").toString
    val ckDir = tmp.resolve("ck").toString
    // corpus rows land as the input parquet "arrival" directory
    Corpus.docRows(spark, n, partitions = 8).write.parquet(inDir)

    val q = StreamingPipeline.run(spark, inDir, outDir, ckDir)
    q.awaitTermination(120000)

    val streamed = spark.read.parquet(outDir)
      .as[graft.core.ExtractedDoc].collect()
      .map(d => d.doc_id -> d).toMap
    val batch = Pipeline.extract(Corpus.docRows(spark, n, partitions = 8))
      .collect().map(d => d.doc_id -> d).toMap

    assert(streamed.keySet == batch.keySet)
    assert(streamed.size == n)
    batch.foreach { case (id, b) =>
      val s = streamed(id)
      assert(s.mime == b.mime, id)
      assert(s.status == b.status, id)
      assert(s.spans == b.spans, s"span sequence drift at $id")
      assert(s.meta == b.meta, s"metadata drift at $id")
    }

    // exactly-once: restarting over the same checkpoint adds no rows
    val q2 = StreamingPipeline.run(spark, inDir, outDir, ckDir)
    q2.awaitTermination(60000)
    assert(spark.read.parquet(outDir).count() == n)
  }
}
