package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SimSearch

class IvfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("IVF ANN: good recall vs brute force; full probe = exact") {
    val e = spark.read.parquet(s"${TestSpark.SfDir}/embeddings.parquet")
    val q = e.filter(col("vec_id") < 10)
    val brute = SimSearch.bruteForceTopK(e, q, k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val ivf = SimSearch.ivfTopK(e, q, dim = 64, k = 5, nClusters = 8, nprobe = 3)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall > 0.3, s"recall=$recall")
    // probing every cluster degenerates to exact search
    val full = SimSearch.ivfTopK(e, q, dim = 64, k = 5, nClusters = 8, nprobe = 8)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert(full == brute)
  }

  test("rcdata: '<' inside title is character data") {
    import graft.engine.{MetaSink, SpanSink}
    val sink = new SpanSink(); val meta = new MetaSink
    graft.html.HtmlExtractor.extract(
      "<html><head><title>a < b &amp; c</title></head><body><p>x</p></body></html>",
      sink, meta)
    assert(meta.result()("title") == Seq("a < b & c"))
  }
}
