package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query set,
  * one pass over the corpus, per-query top-k via window. Scale path:
  * random-hyperplane LSH bucketing; per-bucket joins replace the full
  * cross product. Cosine scoring uses `zip_with` + `aggregate`
  * higher-order functions — codegen'd, no UDFs. Signatures are computed
  * in a partition-local typed map (the plane matrix is regenerated
  * deterministically per partition — nothing is shipped or shuffled).
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

  /** Deterministic pseudo-gaussian plane coefficient for (bit, dim) —
    * splitmix64-style finalizer; executors regenerate planes locally.
    */
  private def planeCoef(bit: Int, d: Int): Double = {
    var h = bit * 1000003L + d * 7919L + 12345L
    h ^= (h >>> 33); h *= 0xff51afd7ed558ccdL; h ^= (h >>> 33)
    (h & 0xffffffffL).toDouble / 0x7fffffffL.toDouble - 1.0
  }

  /** Random-hyperplane signature: `nBits` sign bits, computed in a typed
    * partition-local map (plane matrix built once per partition).
    */
  def lshSignature(df: DataFrame, dim: Int, nBits: Int = 16): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val planes = Array.tabulate(nBits, dim)((b, d) => planeCoef(b, d))
        it.map { case (id, emb) =>
          var sig = 0L
          var b = 0
          while (b < nBits) {
            var dot = 0.0
            val p = planes(b)
            var d = 0
            val n = math.min(dim, emb.length)
            while (d < n) { dot += emb(d) * p(d); d += 1 }
            if (dot > 0) sig |= (1L << b)
            b += 1
          }
          (id, sig)
        }
      }.toDF("vec_id", "lsh_sig")
  }

  /** LSH-bucketed ANN: candidates share a band of the signature; exact
    * cosine re-rank within candidates. Candidate dedup runs over id pairs
    * only; embeddings are joined back just for scoring. Recall < 1 by
    * construction — the scale path where the cross product is infeasible.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, dim: Int, k: Int = 5,
      nBits: Int = 16, bands: Int = 4): DataFrame = {
    val rows = nBits / bands
    def buckets(df: DataFrame, idAs: String) =
      lshSignature(df, dim, nBits)
        .select(col("vec_id").as(idAs),
          explode(array((0 until bands).map(b =>
            concat_ws(":", lit(b),
              shiftrightunsigned(col("lsh_sig"), b * rows)
                .bitwiseAND((1L << rows) - 1))): _*)).as("bucket"))
    val candidates = buckets(queries, "query_id")
      .join(buckets(corpus, "neighbor_id"), "bucket")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id")
      .distinct()
    val scored = candidates
      .join(corpus.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("n_emb")), "neighbor_id")
      .join(broadcast(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("q_emb"))), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("q_emb"), col("n_emb")).as("sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("sim"), 4).as("sim"))
  }
}
