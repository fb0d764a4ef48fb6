package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Dedup, SimSearch, TextOps, TopK}

/** Round-2 regression coverage for the verdict's dedup/ANN findings:
  * q18 simhash blocking recall, q15 planted duplicates, q16 df cap,
  * q20/q28 measured recall, TopK aggregator wiring.
  */
class DedupRound2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docsTable = spark.read.parquet(s"${TestSpark.SfDir}/documents.parquet")

  test("simhashNearDups: blocking recall equals brute force at maxHamming=6") {
    // Round-1 bug: 4×16-bit chunks only guarantee recall for hamming <= 3
    // but the contract calls maxHamming = 6. Blocking on maxHamming+1
    // chunks must find EXACTLY the pairs an all-pairs scan finds.
    val docs = docsTable
    val sigs = Dedup.simhash(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("simhash")))
    val brute = (for {
      (ida, sa) <- sigs; (idb, sb) <- sigs
      if ida < idb && java.lang.Long.bitCount(sa ^ sb) <= 6
    } yield (ida, idb)).toSet
    val blocked = Dedup.simhashNearDups(docs, maxHamming = 6).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(blocked == brute,
      s"missing=${(brute -- blocked).take(5)} extra=${(blocked -- brute).take(5)}")
    // the radius must actually be exercised beyond the old 3-bit guarantee
    val farPairs = (for {
      (ida, sa) <- sigs; (idb, sb) <- sigs
      d = java.lang.Long.bitCount(sa ^ sb)
      if ida < idb && d >= 4 && d <= 6
    } yield (ida, idb)).toSet
    assert(farPairs.nonEmpty,
      "corpus has no hamming 4-6 pairs; test would be vacuous")
    assert(farPairs.subsetOf(blocked))
  }

  test("simhashNearDups: planted hamming 4-6 pair is found") {
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "runs across the wide field toward the distant forest line quickly"
    val toks = base.split(" ")
    // search variants until one lands in the 4..6 band the old blocking lost
    val variants = (1 to toks.length).map { i =>
      (toks.take(i - 1) ++ Array("zzz" + i) ++ toks.drop(i)).mkString(" ")
    }
    val df = (("0", base) +: variants.zipWithIndex.map {
      case (t, i) => ((i + 1).toString, t)
    }).toDF("doc_id", "text")
    val sigs = Dedup.simhash(df).collect()
      .map(r => r.getAs[String]("doc_id") -> r.getAs[Long]("simhash")).toMap
    val inBand = sigs.collect {
      case (id, s) if id != "0" &&
        (4 to 6).contains(java.lang.Long.bitCount(s ^ sigs("0"))) => id
    }
    assert(inBand.nonEmpty, "no variant landed at hamming 4-6; widen search")
    val pairs = Dedup.simhashNearDups(df, maxHamming = 6).collect()
      .map(r => Set(r.getAs[String]("doc_a"), r.getAs[String]("doc_b")))
    inBand.foreach { id =>
      assert(pairs.contains(Set("0", id)), s"pair (0,$id) not found")
    }
  }

  test("simhashNearDups rejects invalid radius") {
    intercept[IllegalArgumentException] {
      Dedup.simhashNearDups(docsTable, maxHamming = 64)
    }
  }

  test("exact dedup finds planted duplicates (round-1 green was vacuous)") {
    val docs = docsTable.select("doc_id", "text")
    val planted = docs.filter(col("doc_id") % 50 === 0)
      .withColumn("doc_id", col("doc_id") + lit(1000000L))
    val nPlanted = planted.count()
    assert(nPlanted > 0)
    val groups = Dedup.exact(docs.unionByName(planted)).collect()
    assert(groups.length == nPlanted)
    assert(groups.forall(_.getAs[Long]("n_dups") == 2L))
    // keep_id is always the original (smaller) doc_id
    assert(groups.forall(_.getAs[Long]("keep_id") < 1000000L))
  }

  test("ngramJaccard maxDf cap: hot shingles leave the index, pairs stay consistent") {
    val docs = docsTable
    val uncapped = Dedup.ngramJaccard(docs, n = 3, threshold = 0.5).collect()
    val capped = Dedup.ngramJaccard(docs, n = 3, threshold = 0.5, maxDf = 5)
      .collect()
    // the cap genuinely drops postings at this SF (max df is 7) but the
    // planted near-dup pairs survive: they share many low-df shingles
    val pu = uncapped.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val pc = capped.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pu == pc, s"pair sets diverged: ${pu.diff(pc)} / ${pc.diff(pu)}")
    // df cap must prune the inverted index itself
    val shAll = Dedup.shingles(docs, 3)
    val hot = shAll.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") > 5).count()
    assert(hot > 0, "no shingle above the cap; cap untested at this SF")
  }

  test("recallVsBrute: exact input gives recall 1.0; degraded input is measured") {
    val e = spark.read.parquet(s"${TestSpark.SfDir}/embeddings.parquet")
    val q = e.filter(col("vec_id") < 10)
    val brute = SimSearch.bruteForceTopK(e, q, k = 5)
    val perfect = SimSearch.recallVsBrute(brute, e, q, k = 5).collect()
    assert(perfect.length == 10)
    assert(perfect.forall(_.getAs[Double]("recall") == 1.0))
    // drop one query's rows entirely: that query must surface with recall 0
    val degraded = brute.filter(col("query_id") =!= 3L)
    val measured = SimSearch.recallVsBrute(degraded, e, q, k = 5).collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Double]("recall")).toMap
    assert(measured(3L) == 0.0)
    assert(measured.filterKeys(_ != 3L).values.forall(_ == 1.0))
  }

  test("LSH recall at q20 settings is high and measured in-plan") {
    val e = spark.read.parquet(s"${TestSpark.SfDir}/embeddings.parquet")
    val q = e.filter(col("vec_id") < 20)
    val lsh = SimSearch.lshTopK(e, q, dim = 64, k = 5, nBits = 16, bands = 8)
    val rec = SimSearch.recallVsBrute(lsh, e, q, k = 5)
      .agg(avg("recall")).head.getDouble(0)
    assert(rec >= 0.9, s"q20 mean recall $rec < 0.9 — retune bands")
  }

  test("embedding-cosine near-dup: LSH candidates are a verified subset of exact") {
    val e = spark.read.parquet(s"${TestSpark.SfDir}/embeddings.parquet")
    val exact = Dedup.embeddingNearDups(e, threshold = 0.4).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(exact.nonEmpty, "no exact pairs at 0.4 — threshold vacuous")
    val lsh = Dedup.embeddingNearDupsLsh(e, threshold = 0.4, dim = 64).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(lsh.subsetOf(exact)) // exact verify means no false positives
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.5, s"LSH pair recall $recall too low — retune bands")
  }

  test("q33: minhash-LSH pair recall/precision vs exact Jaccard stays high") {
    val out = SparkEntry.queries("q33_minhash_quality")(spark, TestSpark.SfDir)
      .collect().head
    assert(out.getAs[Long]("n_exact") > 0)
    assert(out.getAs[Double]("recall") >= 0.9, out.toString)
    assert(out.getAs[Double]("precision") >= 0.9, out.toString)
  }

  test("q32 sketch: HLL distinct-token estimate within the configured rsd") {
    val out = SparkEntry.queries("q32_distinct_sketch")(spark, TestSpark.SfDir)
      .collect().head
    val exact = out.getAs[Long]("n_exact")
    val err = out.getAs[Double]("rel_error")
    assert(exact > 0)
    assert(err <= 0.05, s"rel_error $err above tolerance") // rsd=0.02, 2.5x slack
  }

  test("TopK aggregator matches the sort-based top-k") {
    val docs = docsTable
    val viaAgg = TopK.topTokens(docs, 50)
    val viaSort = TextOps.tokenCounts(docs, minCount = 1)
      .orderBy(col("cnt").desc, col("token").asc).limit(50).collect()
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("cnt"))).toSeq
    assert(viaAgg == viaSort)
  }
}
