package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Dedup

/** Connected-components duplicate clustering semantics. */
class DupClustersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("chains, triangles and singletons resolve to min-id labels") {
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("doc_a", "doc_b")
    val got = Dedup.dupClusters(pairs).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L), got)
  }

  test("long chain converges within the iteration cap") {
    val pairs = (0L until 12L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Dedup.dupClusters(pairs).as[(Long, Long)].collect().toMap
    assert(got.values.toSet == Set(0L), got)
    assert(got.size == 13)
  }

  test("reliable checkpoint dir: same labels, durable shuffle state") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    try {
      val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
        (10L, 12L), (20L, 21L)).toDF("doc_a", "doc_b")
      val got = Dedup.dupClusters(pairs, checkpointDir = Some(dir))
        .as[(Long, Long)].collect().toMap
      assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
        10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L), got)
      // the reliable path must have written RDD checkpoint data to disk
      // (this is what survives an executor loss on a real cluster)
      val wrote = java.nio.file.Files.walk(java.nio.file.Path.of(dir))
        .filter(p => java.nio.file.Files.isRegularFile(p)).count()
      assert(wrote > 0, s"no checkpoint files under $dir")
    } finally {
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Path.of(dir)
      java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists)
    }
  }

  test("q35 contract query joins pairs into per-doc cluster rows") {
    val out = SparkEntry.queries("q35_dup_clusters")(spark, TestSpark.SfDir)
    val rows = out.as[(Long, Long)].collect()
    // every cluster label must itself be a member doc of the cluster
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (label, members) =>
      assert(members.map(_._1).contains(label), s"label $label not a member")
      assert(label == members.map(_._1).min)
    }
  }
}
