package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction for training-data pipelines: emails, 16-digit card
  * numbers, IPv4 addresses and phone numbers are replaced by typed
  * placeholder tokens, with per-category match counts surfaced so a
  * pipeline can gate or audit the scrub.
  *
  * Everything is built-in `regexp_replace`/`regexp_extract_all` —
  * codegen'd, one projection, no shuffle — so at 100 TB the cost is the
  * scan itself. The patterns stay inside the RE2 ∩ java.util.regex
  * common subset (no lookarounds, no backreferences) so the DuckDB
  * oracle replicates the scrub byte-for-byte (same discipline as the
  * q34 regex projections; reference analog: the regex capture layer of
  * tika-parsers' RegexCaptureParser and tika-eval's content filters).
  */
object PiiScrub {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val CardRe  = "\\b\\d{4}[ -]\\d{4}[ -]\\d{4}[ -]\\d{4}\\b"
  val Ipv4Re  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  // same shape as Projections.PhoneRe (q34): cc? sep g3 sep g3-4 [sep g3-4]
  val PhoneRe = "\\+?\\d{1,3}[ .-]\\d{3}[ .-]\\d{3,4}(?:[ .-]\\d{3,4})?"

  /** Redact in fixed order (email → card → ip → phone) so a longer
    * match is never partially consumed by a shorter later pattern.
    */
  def scrub(text: Column): Column = {
    val e = regexp_replace(text, EmailRe, "<EMAIL>")
    val c = regexp_replace(e, CardRe, "<CARD>")
    val i = regexp_replace(c, Ipv4Re, "<IP>")
    regexp_replace(i, PhoneRe, "<PHONE>")
  }

  private def count(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0))).cast("int")

  /** Per-document scrub profile: category counts plus an md5 signature
    * of the scrubbed text (the full text stays out of the contract row
    * on purpose). Each category is counted on the progressively-
    * scrubbed text in the same email→card→ip→phone order `scrub` uses,
    * so the counts equal the redactions actually performed — counting
    * on the raw text would double-count overlaps (the interior of a
    * spaced card number also matches PhoneRe).
    */
  def profile(docs0: DataFrame, textCol: String = "text"): DataFrame = {
    val docs = TextOps.spread(docs0)
    val t = col(textCol)
    val afterEmail = regexp_replace(t, EmailRe, "<EMAIL>")
    val afterCard  = regexp_replace(afterEmail, CardRe, "<CARD>")
    val afterIp    = regexp_replace(afterCard, Ipv4Re, "<IP>")
    docs.select(
      col("doc_id"),
      count(t, EmailRe).as("n_emails"),
      count(afterEmail, CardRe).as("n_cards"),
      count(afterCard, Ipv4Re).as("n_ips"),
      count(afterIp, PhoneRe).as("n_phones"),
      md5(regexp_replace(afterIp, PhoneRe, "<PHONE>")).as("scrub_sig"))
  }
}

/** Unicode text normalization: NFC composition, control-character
  * strip, horizontal-whitespace collapse, trim — the canonicalization
  * pass a training pipeline runs before tokenization/dedup so that
  * byte-different but canonically-equal documents hash identically
  * (the reference normalizes comparably in tika-eval's
  * CompositeTextStatsCalculator input chain).
  *
  * NFC itself runs in a typed `mapPartitions` (`java.text.Normalizer`
  * is the JDK's Unicode implementation; Spark has no built-in) — the
  * same single-pass, shuffle-free shape as TextOps.langId; the rest is
  * codegen'd `regexp_replace`. DuckDB's `nfc_normalize` implements the
  * same Unicode algorithm, which the oracle exploits.
  */
object TextNorm {

  private val CtrlRe = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"
  private val HspaceRe = "[ \\t]+"

  def nfc(s: String): String =
    java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)

  /** doc_id + pre-normalization length + normalized text
    * (NFC → ctrl-strip → collapse → trim), all in one pass — the
    * original length rides along through the mapPartitions so no join
    * back to the input is ever needed.
    */
  def normalize(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val composed = TextOps.spread(docs)
      .select(col("doc_id").cast("string").as("doc_id_str"), col(textCol))
      .as[(String, String)]
      .mapPartitions(_.map { case (id, text) =>
        if (text == null) (id, 0, null: String)
        // code points, not UTF-16 units: n_after is Spark length() and
        // the DuckDB oracle is length(), both Unicode code points —
        // n_before must count in the same units for non-BMP text.
        else (id, text.codePointCount(0, text.length), nfc(text))
      })
      .toDF("doc_id_str", "n_before", "nfc_text")
    val cleaned = trim(regexp_replace(
      regexp_replace(col("nfc_text"), CtrlRe, ""), HspaceRe, " "))
    composed
      .withColumn("doc_id",
        col("doc_id_str").cast(docs.schema("doc_id").dataType))
      .select(col("doc_id"), col("n_before"), cleaned.as("norm_text"))
  }

  /** Contract face: per-document before/after lengths + signature. */
  def profile(docs: DataFrame, textCol: String = "text"): DataFrame =
    normalize(docs, textCol)
      .select(col("doc_id"), col("n_before"),
        length(col("norm_text")).cast("int").as("n_after"),
        md5(col("norm_text")).as("norm_sig"))
}
