package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Top-k (token, count) aggregation without a full vocabulary sort —
  * the tika-eval TokenCountPriorityQueue analog (SURVEY.md §2.9/§2.11
  * "candidate v2: top-k token aggregator") as a typed Spark
  * `Aggregator`: each partition keeps a bounded min-heap of its local
  * winners, merge keeps the global k. Shuffle carries at most k pairs
  * per partition instead of the whole vocabulary.
  */
object TopK {

  type Pair = (String, Long)

  final case class Heap(k: Int, items: mutable.ArrayBuffer[Pair]) {
    def add(p: Pair): Heap = {
      items += p
      if (items.length > k * 4) compact()
      this
    }
    def compact(): Unit = {
      val top = items.sortBy(p => (-p._2, p._1)).take(k)
      items.clear()
      items ++= top
    }
    def result: Seq[Pair] = items.sortBy(p => (-p._2, p._1)).take(k).toSeq
  }

  def aggregator(k: Int): TypedColumn[Pair, Seq[Pair]] =
    new Aggregator[Pair, Heap, Seq[Pair]] {
      def zero: Heap = Heap(k, mutable.ArrayBuffer.empty)
      def reduce(b: Heap, a: Pair): Heap = b.add(a)
      def merge(b1: Heap, b2: Heap): Heap = { b2.items.foreach(b1.add); b1 }
      def finish(r: Heap): Seq[Pair] = r.result
      def bufferEncoder: Encoder[Heap] = Encoders.kryo[Heap]
      def outputEncoder: Encoder[Seq[Pair]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Pair]]()
    }.toColumn

  /** Top-k tokens across a documents table. The groupBy(token) shuffle
    * carries map-side partial counts; the final top-k runs through the
    * bounded-heap `aggregator` as a global typed agg — each task reduces
    * its partition to ≤ 4k pairs, merge keeps the global k. Shuffle
    * volume after the count reduce is O(partitions × k), never the
    * vocabulary.
    */
  def topTokens(docs: DataFrame, k: Int): Seq[Pair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val counts = TextOps.tokenCounts(docs, minCount = 1)
      .as[(String, Long)]
    counts.select(aggregator(k)).head()
  }
}
