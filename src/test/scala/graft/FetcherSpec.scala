package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.Fetchers

/** Round-3 verdict item #10: the media_ref-resolving fetcher stage. */
class FetcherSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fs fetcher: jailed to root, resolves files, rejects traversal") {
    val dir = java.nio.file.Files.createTempDirectory("graftfetch")
    java.nio.file.Files.write(dir.resolve("a.bin"), Array[Byte](1, 2, 3))
    java.nio.file.Files.createDirectories(dir.resolve("sub"))
    java.nio.file.Files.write(dir.resolve("sub/b.bin"), Array[Byte](4))
    val f = new Fetchers.FsFetcher(dir.toString)
    assert(f.fetch("fs://a.bin").map(_.toSeq).contains(Seq[Byte](1, 2, 3)))
    assert(f.fetch("fs://sub/b.bin").map(_.toSeq).contains(Seq[Byte](4)))
    assert(f.fetch("fs://../etc/passwd").isEmpty)   // traversal jail
    assert(f.fetch("fs://missing.bin").isEmpty)
  }

  test("resolvePayloads fills only missing payloads, per scheme") {
    val dir = java.nio.file.Files.createTempDirectory("graftfetch2")
    java.nio.file.Files.write(dir.resolve("x.bin"), Array[Byte](9, 9))
    val df = Seq(
      ("fs://x.bin", null: Array[Byte]),          // fetched
      ("fs://gone.bin", null: Array[Byte]),       // unresolvable -> null
      ("other://y", null: Array[Byte]),           // no fetcher -> null
      ("fs://x.bin", Array[Byte](7))              // existing payload kept
    ).toDF("media_ref", "payload")
    val out = Fetchers.resolvePayloads(df, Seq(new Fetchers.FsFetcher(dir.toString)))
      .collect().map(r => (r.getString(0), Option(r.getAs[Array[Byte]](1)).map(_.toSeq)))
    assert(out(0)._2.contains(Seq[Byte](9, 9)))
    assert(out(1)._2.isEmpty)
    assert(out(2)._2.isEmpty)
    assert(out(3)._2.contains(Seq[Byte](7)))
  }

  test("blob fetcher returns real parseable media containers") {
    val f = new Fetchers.CorpusBlobFetcher
    val bytes = f.fetch("blob://deadbeef").get
    val meta = graft.media.MediaParser.parse(bytes)
    assert(meta.isDefined, "blob bytes must be a real container")
  }

  test("q21 corpus rows never hit the stub decode any more") {
    val out = SparkEntry.queries("q21_media_features")(spark, TestSpark.SfDir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // the stub decode stamps mime application/octet-stream; with the
    // fetcher stage every corpus row decodes a real container
    assert(rows.forall(_.getAs[String]("mime") != "application/octet-stream"),
      rows.map(r => (r.getAs[String]("media_ref"), r.getAs[String]("mime")))
        .filter(_._2 == "application/octet-stream").take(5).mkString(","))
  }
}
