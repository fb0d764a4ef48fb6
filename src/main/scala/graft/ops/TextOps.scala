package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines, mirroring the
  * reference's tika-eval calculators (tika-eval-core textstats package):
  * token counting, char-quality metrics, common-token (stopword) rates,
  * profile signatures, language id. All are expressed with codegen'd
  * built-in functions — no UDFs — so they stay inside whole-stage
  * codegen and scale linearly with input.
  */
object TextOps {

  /** Scale-adaptive input spread (guide §2.5 "input skew … repartition
    * immediately after the read"): per-row-heavy operators (regex
    * scrubbing, language id, shingling, signatures) parallelize only as
    * far as the scan's split count, and a small corpus — or one huge
    * unsplittable file — yields fewer splits than cores; at sf0.1 the
    * whole documents table is ONE sub-`maxPartitionBytes` split, which
    * serialized every text operator onto a single core. When the scan
    * already yields ≥ defaultParallelism partitions (any real corpus)
    * this is a NO-OP; otherwise the round-robin repartition costs one
    * tiny exchange and buys full-width parallelism. Callers pass plans
    * that are narrow over the scan (no upstream exchange), so the
    * partition-count probe compiles without running a job. Results are
    * unaffected: every downstream operator is row-pure or
    * key-aggregated (order-dependent double-sums never ride this path).
    */
  private[graft] def spread(df: DataFrame): DataFrame = {
    // guard rails for arbitrary callers: streaming plans cannot be
    // probed, and a plan that already contains an exchange would have
    // its upstream stages EXECUTED by the .rdd partition probe (AQE
    // materializes query stages) — such plans get full-width
    // parallelism from their own shuffle anyway, so pass them through
    if (df.isStreaming) return df
    val hasExchange = df.queryExecution.sparkPlan.exists {
      case _: org.apache.spark.sql.execution.exchange.Exchange => true
      case _ => false
    }
    if (hasExchange) return df
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < want) df.repartition(want) else df
  }

  /** Whitespace tokenization used consistently across ops + oracles
    * (single-space split keeps DuckDB `string_split` parity).
    */
  def tokens(text: Column): Column =
    filter(split(lower(text), " "), t => t =!= "")

  /** English stopword list for the quality gate's stop_ratio (public
    * high-frequency function words); language ID itself uses the
    * [[LangProfiles]] n-gram models via [[LangScorer]].
    */
  val StopwordsEn: Seq[String] = Seq("the", "and", "of", "to", "a", "in",
    "is", "that", "it", "for", "on", "with", "as", "was", "at", "by")

  private def stopCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** Per-doc token/char statistics (BasicTokenCountStatsCalculator +
    * ContentLengthCalculator analogs).
    */
  def docStats(docs0: DataFrame): DataFrame = {
    val docs = spread(docs0)
    val toks = tokens(col("text"))
    docs.select(
      col("doc_id"),
      length(col("text")).as("n_chars"),
      size(toks).as("n_tokens"),
      size(array_distinct(toks)).as("n_unique_tokens")
    )
  }

  /** Token frequency table (TokenCounts analog):
    * explode → groupBy(token) → count. Map-side partial aggregation makes
    * the shuffle carry only (token, partial_count) pairs.
    */
  def tokenCounts(docs: DataFrame, minCount: Long = 5): DataFrame =
    spread(docs).select(explode(tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)

  /** Language ID over 32 languages: multinomial scoring of char
    * trigrams against the [[LangProfiles]] frequency profiles
    * (reference analog: tika-langdetect-optimaize
    * OptimaizeLangDetector.java's n-gram language models — same
    * algorithmic shape, profiles derived from the reference's public
    * per-language token-frequency data).
    *
    * cost(doc, lang) = Σ_gram cost(gram|lang) + unseen·cost0(lang),
    * all INTEGER arithmetic (quantized -1000·ln p), so the DuckDB
    * oracle reproduces the scores bit-for-bit in any aggregation
    * order; prediction = argmin with ascending-code tie-break.
    *
    * Scale: one pass, no shuffle — the profile table is a per-executor
    * constant (6.4k grams); each partition scores locally. The 100 TB
    * cost is the scan itself.
    */
  def langId(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    spread(docs).select(col("doc_id").cast("string").as("doc_id_str"), col("text"))
      .as[(String, String)]
      .mapPartitions(_.map { case (id, text) =>
        val (pred, nGrams, best) = LangScorer.score(text)
        (id, pred, nGrams, best)
      })
      .toDF("doc_id_str", "lang_pred", "n_grams", "cost_best")
      .withColumn("doc_id",
        col("doc_id_str").cast(docs.schema("doc_id").dataType))
      .select("doc_id", "lang_pred", "n_grams", "cost_best")
  }

  /** Confusion matrix of predicted vs labeled language over a documents
    * table carrying a `lang` ground-truth column — the LID accuracy
    * check a training pipeline gates ingestion on.
    */
  def langIdConfusion(docs: DataFrame): DataFrame =
    langId(docs)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .groupBy("lang", "lang_pred")
      .agg(count(lit(1)).as("n"))

  /** Quality scoring: length, stopword ratio, punctuation density, mean
    * token length (tika-eval ReplacementCharCounter/NonAsciiCharCounter
    * family generalized to a training-data quality gate).
    * All ratios rounded to 4 decimals for cross-engine comparability.
    */
  def qualityScore(docs0: DataFrame): DataFrame = {
    val docs = spread(docs0)
    val toks = tokens(col("text"))
    val nChars = length(col("text"))
    val nTokens = size(toks)
    val stopRatio = round(stopCount(toks, StopwordsEn)
      .cast("double") / greatest(nTokens, lit(1)), 4)
    val punct = length(col("text")) -
      length(regexp_replace(col("text"), "[.,;:!?]", ""))
    val punctRatio = round(punct.cast("double") / greatest(nChars, lit(1)), 4)
    val meanTokLen = round(
      aggregate(transform(toks, t => length(t)), lit(0), (acc, v) => acc + v)
        .cast("double") / greatest(nTokens, lit(1)), 4)
    docs.select(col("doc_id"), nChars.as("n_chars"), nTokens.as("n_tokens"),
        stopRatio.as("stop_ratio"), punctRatio.as("punct_ratio"),
        meanTokLen.as("mean_token_len"))
      .withColumn("quality_ok",
        (col("n_tokens") >= 5) && (col("stop_ratio") >= 0.05) &&
        (col("punct_ratio") <= 0.2))
  }

  /** Gopher-style composite quality gate: per document, a keep flag and
    * the FIRST failing rule's name (fixed rule order makes the reason
    * deterministic) — the accept/reject decision a training pipeline
    * applies before dedup/tokenization (Rae et al. 2021 "Gopher" §A1.1
    * quality heuristics, re-thresholded for this corpus). One codegen'd
    * projection over the scan: the decision never leaves the scan stage
    * at 100 TB, same shape as q13/q37.
    */
  def qualityGate(docs0: DataFrame): DataFrame = {
    // NULL text must fail the gate (too_short), not fall through every
    // NULL WHEN condition to otherwise("keep") — treat null as empty.
    val docs = spread(docs0).withColumn("text", coalesce(col("text"), lit("")))
    val toks = tokens(col("text"))
    val lines = filter(split(col("text"), "\n"), l => l =!= "")
    val nTokens = size(toks)
    val stopRatio = round(stopCount(toks, StopwordsEn)
      .cast("double") / greatest(nTokens, lit(1)), 4)
    val punct = length(col("text")) -
      length(regexp_replace(col("text"), "[.,;:!?]", ""))
    val punctRatio = round(punct.cast("double") /
      greatest(length(col("text")), lit(1)), 4)
    val dupLineFrac = round(lit(1.0) - size(array_distinct(lines))
      .cast("double") / greatest(size(lines), lit(1)), 4)
    docs.select(col("doc_id"), nTokens.as("n_tokens"),
        stopRatio.as("stop_ratio"), punctRatio.as("punct_ratio"),
        dupLineFrac.as("dup_line_frac"))
      .withColumn("reason",
        when(col("n_tokens") < 20, "too_short")
          .when(col("stop_ratio") < 0.03, "low_stopwords")
          .when(col("punct_ratio") > 0.2, "high_punct")
          .when(col("dup_line_frac") > 0.3, "repetitive")
          .otherwise("keep"))
      .select(col("doc_id"), col("n_tokens"),
        (col("reason") === "keep").cast("int").as("keep"), col("reason"))
  }

  /** CommonTokens OOV rate (tika-eval CommonTokens: % of tokens NOT in
    * the language's common-words list), evaluated against the PREDICTED
    * language's top-200 common-word list (32 languages,
    * [[LangProfiles.CommonWords]]). zh keeps the char-level path —
    * whitespace tokens are meaningless for unsegmented text, so zh OOV
    * runs per CJK character against the common-function-character set.
    */
  def commonTokens(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    spread(docs).select(col("doc_id").cast("string").as("doc_id_str"), col("text"))
      .as[(String, String)]
      .mapPartitions(_.map { case (id, text) =>
        val (pred, _, _) = LangScorer.score(text)
        val toks = text.toLowerCase(java.util.Locale.ROOT).split(' ')
          .filter(_.nonEmpty)
        val nTokens = toks.length
        val (hits, denom) =
          if (pred == "zh") {
            var cjk = 0; var common = 0
            var i = 0
            while (i < text.length) {
              val c = text.charAt(i)
              if (c >= 0x4e00 && c <= 0x9fff) cjk += 1
              if ("的了是在和不有我他这".indexOf(c) >= 0) common += 1
              i += 1
            }
            (common, cjk)
          } else {
            val words = LangProfiles.CommonWords(pred)
            (toks.count(words.contains), nTokens)
          }
        val oov = BigDecimal(1.0 - hits.toDouble / math.max(denom, 1))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        (id, pred, nTokens, hits, oov)
      })
      .toDF("doc_id_str", "lang_pred", "n_tokens", "common_hits", "oov_rate")
      .withColumn("doc_id",
        col("doc_id_str").cast(docs.schema("doc_id").dataType))
      .select("doc_id", "lang_pred", "n_tokens", "common_hits", "oov_rate")
  }

  /** Document fingerprint (TextProfileSignature analog): md5 of the
    * sorted distinct token set — robust to token order/duplication.
    */
  def fingerprint(docs: DataFrame): DataFrame =
    spread(docs).select(col("doc_id"),
      md5(concat_ws(" ", array_sort(array_distinct(tokens(col("text"))))))
        .as("profile_sig"),
      md5(col("text")).as("exact_sig"))
}

/** Partition-local language scorer over [[LangProfiles]], mirroring
  * the reference's two-stage detector architecture (tika-langdetect
  * charsoup's script routing + optimaize's n-gram models):
  *
  *  1. Script routing — scripts that identify a language outright
  *     (Kana→ja, Hangul→ko, Thai→th, Hebrew→he, Greek→el,
  *     Devanagari→hi, Han without Kana→zh) classify directly at ≥ 5%
  *     of code points; unsegmented scripts have no usable space-token
  *     n-grams, so this is the correct path, not a shortcut.
  *  2. Within-script n-gram scoring — Latin / Cyrillic / Arabic script
  *     groups argmin the integer trigram cost over the group's
  *     languages (tokenize, pad, slide code-point trigrams).
  *
  * All decisions are integer arithmetic, so the DuckDB oracle
  * reproduces them bit-for-bit. Static per-JVM; ~5k-entry hash index.
  */
object LangScorer {

  val GramLangs: Array[String] =
    LangProfiles.Langs.filterNot(LangProfiles.ScriptDirect).toArray
  private val cost0: Array[Long] = GramLangs.map(LangProfiles.Cost0(_).toLong)
  private val groupOf: Array[String] = GramLangs.map(LangProfiles.Groups(_))

  /** gram -> packed (langIdx << 32 | cost) entries. */
  private val index: java.util.HashMap[String, Array[Long]] = {
    val m = new java.util.HashMap[String, Array[Long]]()
    var li = 0
    while (li < GramLangs.length) {
      LangProfiles.Profiles(GramLangs(li)).foreach { case (g, c) =>
        val prev = m.get(g)
        val packed = (li.toLong << 32) | c.toLong
        m.put(g, if (prev == null) Array(packed) else prev :+ packed)
      }
      li += 1
    }
    m
  }

  private def in(cp: Int, lo: Int, hi: Int): Boolean = cp >= lo && cp <= hi

  /** Returns (lang_pred, n_grams, best_cost); best_cost = -1 for
    * script-direct classifications. Gram ties break to the
    * lexicographically smallest code (GramLangs is sorted).
    */
  def score(text: String): (String, Int, Long) = {
    // script census over code points (DuckDB length/regexp parity)
    var ncp = 0
    var han = 0; var kana = 0; var hangul = 0; var thai = 0
    var hebrew = 0; var greek = 0; var deva = 0; var arab = 0; var cyr = 0
    var ci = 0
    while (ci < text.length) {
      val cp = text.codePointAt(ci)
      ncp += 1
      if (in(cp, 0x4e00, 0x9fff)) han += 1
      else if (in(cp, 0x3040, 0x30ff)) kana += 1
      else if (in(cp, 0xac00, 0xd7af)) hangul += 1
      else if (in(cp, 0x0e00, 0x0e7f)) thai += 1
      else if (in(cp, 0x0590, 0x05ff)) hebrew += 1
      else if (in(cp, 0x0370, 0x03ff)) greek += 1
      else if (in(cp, 0x0900, 0x097f)) deva += 1
      else if (in(cp, 0x0600, 0x06ff)) arab += 1
      else if (in(cp, 0x0400, 0x04ff)) cyr += 1
      ci += Character.charCount(cp)
    }
    val n = GramLangs.length
    val matchedCost = new Array[Long](n)
    val matchedTf = new Array[Long](n)
    var total = 0L
    val toks = text.toLowerCase(java.util.Locale.ROOT).split(' ')
    var ti = 0
    while (ti < toks.length) {
      val t = toks(ti)
      if (t.nonEmpty) {
        val padded = " " + t + " "
        val cps = padded.codePoints().toArray
        var i = 0
        while (i + 2 < cps.length) {
          total += 1
          val hits = index.get(new String(cps, i, 3))
          if (hits != null) {
            var h = 0
            while (h < hits.length) {
              val li = (hits(h) >>> 32).toInt
              matchedCost(li) += hits(h) & 0xffffffffL
              matchedTf(li) += 1
              h += 1
            }
          }
          i += 1
        }
      }
      ti += 1
    }
    val m = math.max(ncp, 1)
    val direct =
      if (kana * 20 >= m) "ja"
      else if (hangul * 20 >= m) "ko"
      else if (thai * 20 >= m) "th"
      else if (hebrew * 20 >= m) "he"
      else if (greek * 20 >= m) "el"
      else if (deva * 20 >= m) "hi"
      else if (han * 20 >= m) "zh"
      else null
    if (direct != null) return (direct, total.toInt, -1L)
    val grp =
      if (arab * 20 >= m) "arab"
      else if (cyr * 20 >= m) "cyr"
      else "latin"
    var best = -1
    var bestCost = Long.MaxValue
    var li = 0
    while (li < n) {
      if (groupOf(li) == grp) {
        val c = matchedCost(li) + (total - matchedTf(li)) * cost0(li)
        if (c < bestCost) { bestCost = c; best = li }
      }
      li += 1
    }
    (GramLangs(best), total.toInt, bestCost)
  }
}
