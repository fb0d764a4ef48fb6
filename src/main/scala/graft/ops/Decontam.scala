package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora: flag every training
  * document that shares an n-token shingle with an eval/benchmark set
  * (the standard n-gram-overlap decontamination step a pipeline runs
  * before training, n=8 by convention).
  *
  * Scale shape (100 TB): the benchmark side is tiny next to the corpus
  * (an eval suite is ~10^5 shingles), so its distinct shingle-signature
  * set is BROADCAST — the corpus side never shuffles for the join. The
  * per-doc dedup + count aggregates over (doc_id, 16-byte md5 signature)
  * pairs, never shingle text, so the only exchange is hash-width. The
  * shingle explode itself is scan-parallel (whole-stage codegen:
  * split/slice/array_join/md5 are all built-ins; no UDFs).
  *
  * Reference analog: tika-eval's common-token/overlap calculators
  * (tika-eval-core textstats) compute the same shingle-profile overlap
  * between two corpora; the md5-signature discipline matches q14/q38.
  */
object Decontam {

  /** All n-token shingles of a token array as space-joined strings;
    * empty array when the doc is shorter than n (sequence() would
    * otherwise count DOWN for a negative span and fabricate grams).
    */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + lit(1), lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Contamination report: for every training doc (the non-benchmark
    * side) that shares at least one distinct 8-gram with the benchmark
    * docs (doc_id % benchMod == 0), the doc's distinct-shingle count and
    * how many of those shingles appear in the benchmark set.
    */
  def contamination(docs: DataFrame, n: Int = 8,
                    benchMod: Int = 97): DataFrame = {
    val isBench = col("doc_id") % benchMod === 0
    // distinct (doc, shingle-signature) pairs. Signatures are xxhash64
    // over the n-token slice array: no gram-string or md5-hex
    // materialization, and the distinct's exchange carries 8-byte longs
    // instead of 32-char hex strings (guide §2.3 "narrower types",
    // measured 2.6→1.7 s at sf0.1). Output counts are identical to the
    // md5-string path modulo 64-bit collisions (≈ m²/2⁶⁵; verified
    // bit-equal against the md5-keyed DuckDB oracle at every
    // correctness SF).
    // toks is MATERIALIZED as a column before the transform: higher-
    // order-function lambdas are interpreted and re-evaluate outer
    // expression references per element, so a lambda body that names
    // the split() directly re-tokenizes the whole document once per
    // shingle (measured 47× blowup at sf0.1 — the old gram-string path
    // had the same shape via Decontam.shingles over an inline tokens()).
    val sigs = when(size(col("toks")) >= n,
      transform(sequence(lit(0), size(col("toks")) - n),
        i => xxhash64(slice(col("toks"), i + lit(1), lit(n)))))
      .otherwise(array().cast("array<long>"))
    val dg = TextOps.spread(docs)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(sigs).as("sig"))
      .distinct()
    val bench = broadcast(
      dg.filter(isBench).select("sig").distinct().withColumn("hit", lit(1)))
    dg.filter(!isBench)
      .join(bench, Seq("sig"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_grams"),
        sum(coalesce(col("hit"), lit(0))).cast("int").as("n_hits"))
      .filter(col("n_hits") > 0)
  }
}

/** Deterministic stratified holdout sampling: hash-bucket every doc into
  * 0..255 from the md5 of its id and keep it when the bucket falls under
  * its stratum's threshold. Re-running the job on a grown corpus keeps
  * every previously-selected doc selected (hash sampling is stable under
  * appends — the property a train/eval split must have), unlike
  * `df.sample` whose draw depends on partitioning.
  *
  * Scale shape: one codegen'd projection + one partial-agg groupBy on
  * the (few) strata — no row-level shuffle; the sample decision itself
  * never leaves the scan stage.
  */
object Holdout {

  /** 0..255 bucket from the first two hex chars of md5(doc_id) — chosen
    * over xxhash64/hash() because md5 is the cross-engine hash (the
    * DuckDB oracle replays it byte-for-byte).
    */
  def bucket(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 2), 16, 10).cast("int")

  /** Per-stratum sample rate in buckets-of-256: 32..128 (12.5%..50%),
    * keyed off the stratum name so strata genuinely differ.
    */
  def threshold(stratum: Column): Column =
    lit(32) + (length(stratum) % 4) * lit(32)

  /** Aggregate audit of the sample: per stratum, total docs, sampled
    * docs, and the target threshold — the shape a pipeline gate checks
    * before accepting a split.
    */
  def stratifiedAudit(docs: DataFrame, stratum: String = "source"): DataFrame =
    TextOps.spread(docs)
      .select(col(stratum).as("stratum"),
        (bucket(col("doc_id")) < threshold(col(stratum))).cast("int").as("sampled"))
      .groupBy("stratum")
      .agg(count(lit(1)).cast("long").as("n_total"),
        sum(col("sampled")).cast("long").as("n_sampled"))
      .withColumn("threshold", threshold(col("stratum")).cast("int"))
}
