package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Decontam, Holdout}

/** Benchmark decontamination + stratified holdout sampling (q42/q43).
  * The DuckDB oracle replays both end-to-end at sf0.01; these pin the
  * operator semantics on hand-built rows plus the scale-critical plan
  * shapes (benchmark side broadcast, no UDF, signature-width shuffles).
  */
class DecontamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.spark

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("shingles: full windows only, short docs yield none") {
    val s = spark
    import s.implicits._
    val out = Seq("a b c d e", "a b", "").toDF("text")
      .select(Decontam.shingles(graft.ops.TextOps.tokens(col("text")), 3)
        .as("g"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) == Seq("a b c", "b c d", "c d e"))
    assert(out(1).isEmpty && out(2).isEmpty)
  }

  test("contamination: only docs sharing an n-gram with the benchmark") {
    // bench doc 0 (0%97==0) carries "w1..w8"; doc 5 repeats it verbatim,
    // doc 6 shares only 7 tokens, doc 7 disjoint.
    val d = docs(
      (0L, "w1 w2 w3 w4 w5 w6 w7 w8 tail"),
      (5L, "head w1 w2 w3 w4 w5 w6 w7 w8"),
      (6L, "w1 w2 w3 w4 w5 w6 w7 x"),
      (7L, "a b c d e f g h i j"))
    val out = Decontam.contamination(d).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("doc_id") == 5L)
    assert(r.getAs[Int]("n_hits") == 1)   // exactly the shared 8-gram
    assert(r.getAs[Int]("n_grams") == 2)  // doc 5 has two 8-grams
  }

  test("contamination: repeated shingle counts once (distinct pairs)") {
    val d = docs(
      (0L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8 stop w1 w2 w3 w4 w5 w6 w7 w8"))
    val out = Decontam.contamination(d).collect()
    assert(out.length == 1 && out.head.getAs[Int]("n_hits") == 1)
  }

  test("plan shape: benchmark side broadcast, corpus side not shuffled for the join") {
    val d = docs((0L, "w1 w2 w3 w4 w5 w6 w7 w8"), (5L, "w1 w2 w3 w4 w5 w6 w7 w8"))
    val plan = Decontam.contamination(d).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"benchmark join must broadcast:\n$plan")
    assert(!plan.toLowerCase.contains("sortmergejoin"),
      s"corpus side must not sort-merge:\n$plan")
  }

  test("holdout: buckets deterministic, threshold keyed off stratum") {
    val s = spark
    import s.implicits._
    val d = Seq((1L, "alpha.com"), (2L, "alpha.com"), (3L, "bee.org"))
      .toDF("doc_id", "source")
    val out = Holdout.stratifiedAudit(d).orderBy("stratum").collect()
    // len("alpha.com")=9 -> 32+1*32=64; len("bee.org")=7 -> 32+3*32=128
    assert(out(0).getAs[String]("stratum") == "alpha.com" &&
      out(0).getAs[Int]("threshold") == 64)
    assert(out(1).getAs[String]("stratum") == "bee.org" &&
      out(1).getAs[Int]("threshold") == 128)
    assert(out.forall(r => r.getAs[Long]("n_sampled") <= r.getAs[Long]("n_total")))
    // stability: same ids, same decision on re-run
    val again = Holdout.stratifiedAudit(d).orderBy("stratum").collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("holdout: append-stability — grown corpus keeps prior picks") {
    val s = spark
    import s.implicits._
    val small = (0L to 99L).map(i => (i, "src.net")).toDF("doc_id", "source")
    val big = (0L to 199L).map(i => (i, "src.net")).toDF("doc_id", "source")
    def picked(df: org.apache.spark.sql.DataFrame): Set[Long] = df
      .select(col("doc_id"),
        (Holdout.bucket(col("doc_id")) < Holdout.threshold(col("source"))).as("in"))
      .filter(col("in")).collect().map(_.getLong(0)).toSet
    val p1 = picked(small)
    val p2 = picked(big)
    assert(p1.subsetOf(p2), "append must not evict previously-sampled docs")
    assert(p1.nonEmpty && p2.size > p1.size)
  }
}
