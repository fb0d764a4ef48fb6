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

  /** Whitespace tokenization used consistently across ops + oracles
    * (single-space split keeps DuckDB `string_split` parity).
    */
  def tokens(text: Column): Column =
    filter(split(lower(text), " "), t => t =!= "")

  /** Stopword lists for the n-gram-free language-ID heuristic (public
    * high-frequency function words; reference analog:
    * tika-langdetect / tika-eval LanguageIDWrapper).
    */
  val StopwordsEn: Seq[String] = Seq("the", "and", "of", "to", "a", "in",
    "is", "that", "it", "for", "on", "with", "as", "was", "at", "by")
  val StopwordsDe: Seq[String] = Seq("der", "die", "das", "und", "ist",
    "von", "zu", "mit", "den", "nicht", "ein", "eine", "auf", "für")
  val StopwordsFr: Seq[String] = Seq("le", "la", "les", "de", "des", "et",
    "est", "un", "une", "dans", "que", "pour", "sur", "avec")
  val StopwordsEs: Seq[String] = Seq("el", "la", "los", "las", "de", "y",
    "es", "un", "una", "en", "que", "por", "con", "para")

  private def stopCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** CJK ideograph count — whitespace tokenization is meaningless for
    * Chinese, so zh detection runs at the character level: a document
    * whose CJK fraction exceeds 5% of its characters is zh. The common-
    * token analog for zh counts high-frequency function characters.
    */
  private val CjkRange = "[\\x{4e00}-\\x{9fff}]"
  private val ZhCommonChars = "[的了是在和不有我他这]"
  private def cjkCount(text: Column): Column =
    length(text) - length(regexp_replace(text, CjkRange, ""))
  private def zhCommonCount(text: Column): Column =
    length(text) - length(regexp_replace(text, ZhCommonChars, ""))

  /** Shared lang_pred expression: char-level zh rule first, then
    * stopword-hit voting over {en,de,fr,es} with deterministic tie-break.
    */
  private def langPred: Column =
    when(col("c_zh") > greatest(col("n_chars"), lit(1)) * 0.05, "zh")
      .when(col("c_en") >= col("c_de") && col("c_en") >= col("c_fr") &&
            col("c_en") >= col("c_es"), "en")
      .when(col("c_de") >= col("c_fr") && col("c_de") >= col("c_es"), "de")
      .when(col("c_fr") >= col("c_es"), "fr")
      .otherwise("es")

  /** Per-doc token/char statistics (BasicTokenCountStatsCalculator +
    * ContentLengthCalculator analogs).
    */
  def docStats(docs: DataFrame): DataFrame = {
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
    docs.select(explode(tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)

  /** Language ID: char-level CJK rule for zh, then stopword-hit voting
    * over {en,de,fr,es} with deterministic tie-break by that order.
    * (n-gram-histogram LID would need model weights; stopword voting is
    * the standard cheap heuristic — reference analog tika-langdetect /
    * LanguageIDWrapper.)
    */
  def langId(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    docs.select(col("doc_id"),
        length(col("text")).as("n_chars"),
        cjkCount(col("text")).as("c_zh"),
        stopCount(toks, StopwordsEn).as("c_en"),
        stopCount(toks, StopwordsDe).as("c_de"),
        stopCount(toks, StopwordsFr).as("c_fr"),
        stopCount(toks, StopwordsEs).as("c_es"))
      .withColumn("lang_pred", langPred)
      .select("doc_id", "lang_pred", "c_en", "c_de", "c_fr", "c_es", "c_zh")
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
  def qualityScore(docs: DataFrame): DataFrame = {
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

  /** CommonTokens OOV rate (tika-eval CommonTokens: % of tokens NOT in
    * the language's common-words list), evaluated against the PREDICTED
    * language's stopword list.
    */
  def commonTokens(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    docs.select(col("doc_id"),
        size(toks).as("n_tokens"),
        length(col("text")).as("n_chars"),
        cjkCount(col("text")).as("c_zh"),
        zhCommonCount(col("text")).as("c_zh_common"),
        stopCount(toks, StopwordsEn).as("c_en"),
        stopCount(toks, StopwordsDe).as("c_de"),
        stopCount(toks, StopwordsFr).as("c_fr"),
        stopCount(toks, StopwordsEs).as("c_es"))
      .withColumn("lang_pred", langPred)
      .withColumn("common_hits",
        when(col("lang_pred") === "zh", col("c_zh_common"))
        .when(col("lang_pred") === "en", col("c_en"))
        .when(col("lang_pred") === "de", col("c_de"))
        .when(col("lang_pred") === "fr", col("c_fr"))
        .otherwise(col("c_es")))
      // zh OOV runs per CJK character (whitespace tokens are meaningless
      // for unsegmented text); latin languages per token
      .withColumn("oov_rate", round(lit(1.0) -
        col("common_hits").cast("double") /
          greatest(when(col("lang_pred") === "zh", col("c_zh"))
            .otherwise(col("n_tokens")), lit(1)), 4))
      .select("doc_id", "lang_pred", "n_tokens", "common_hits", "oov_rate")
  }

  /** Document fingerprint (TextProfileSignature analog): md5 of the
    * sorted distinct token set — robust to token order/duplication.
    */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      md5(concat_ws(" ", array_sort(array_distinct(tokens(col("text"))))))
        .as("profile_sig"),
      md5(col("text")).as("exact_sig"))
}
