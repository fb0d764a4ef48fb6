package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query set,
  * one pass over the corpus, per-query top-k via window. Scale path:
  * LSH bucketing by random-hyperplane signs (per-bucket joins replace the
  * full cross product; probes = number of sign-flip neighbor buckets).
  * Dot products use `zip_with` + `aggregate` higher-order functions —
  * codegen'd, no UDFs.
  */
object SimSearch {

  /** cosine(a, b) in double precision (deterministic left-to-right sums). */
  private def cosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))
    val nb = sqrt(aggregate(transform(b, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))
    dot / (na * nb)
  }

  /** Brute-force cosine top-k: queries × corpus (queries broadcast), rank
    * by (sim desc, id asc) for deterministic output.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5): DataFrame = {
    val joined = corpus.as("c").crossJoin(broadcast(queries.as("q")))
      .filter(col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        cosine(col("q.embedding"), col("c.embedding")).as("sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("sim"), 4).as("sim"))
  }

  /** Random-hyperplane LSH signature: `nBits` sign bits of dot products
    * with pseudo-random planes derived deterministically from (bit, dim)
    * via a hash-based pseudo-gaussian (sum of 4 uniforms), so executors
    * regenerate planes locally — nothing shipped.
    */
  def lshSignature(df: DataFrame, dim: Int, nBits: Int = 16): DataFrame = {
    // plane(bit)(d) — deterministic pseudo-random in [-1,1]
    def coef(bit: Int, d: Int): Double = {
      var h = bit * 1000003L + d * 7919L + 12345L
      h ^= (h >>> 33); h *= 0xff51afd7ed558ccdL; h ^= (h >>> 33)
      (h & 0xffffffffL).toDouble / 0x7fffffffL.toDouble - 1.0
    }
    val bits = (0 until nBits).map { b =>
      val dot = (0 until dim).map(d =>
        element_at(col("embedding"), d + 1).cast("double") * lit(coef(b, d)))
        .reduce(_ + _)
      when(dot > 0, 1L << b).otherwise(0L)
    }
    df.withColumn("lsh_sig", bits.reduce(_.bitwiseOR(_)))
  }

  /** LSH-bucketed ANN: candidates share a band of the signature; exact
    * cosine re-rank within candidates. Recall < 1 by construction — the
    * scale path for corpora where the cross product is infeasible.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, dim: Int, k: Int = 5,
      nBits: Int = 16, bands: Int = 4): DataFrame = {
    val rows = nBits / bands
    def banded(df: DataFrame, idAs: String) =
      lshSignature(df, dim, nBits)
        .select(col("vec_id").as(idAs), col("embedding").as(idAs + "_emb"),
          explode(array((0 until bands).map(b =>
            concat_ws(":", lit(b),
              shiftrightunsigned(col("lsh_sig"), b * rows)
                .bitwiseAND((1L << rows) - 1))): _*)).as("bucket"))
    val c = banded(corpus, "neighbor_id")
    val q = banded(queries, "query_id")
    val candidates = q.join(c, "bucket")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "query_id_emb", "neighbor_id", "neighbor_id_emb")
      .distinct()
    val scored = candidates.select(col("query_id"), col("neighbor_id"),
      cosine(col("query_id_emb"), col("neighbor_id_emb")).as("sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("sim"), 4).as("sim"))
  }
}
