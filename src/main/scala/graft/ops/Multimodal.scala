package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media payloads travel as opaque `binary` columns + typed metadata
  * structs; decode / feature-extract run as partition-local batch
  * functions (`mapPartitions`) so a real codec binding drops in without
  * changing the plan shape. The decode step itself is STUBBED with a
  * deterministic fake — image/audio libraries are not available in this
  * container — but schema, batching, and partitioning are real.
  *
  * Reference analog: tika's image/AV parsers extract *metadata only*
  * (JpegParser/Mp3Parser etc., SURVEY.md §2.7) — media rows stay opaque
  * and ride along as `media` spans.
  */
object Multimodal {

  final case class MediaMeta(
      media_ref: String,
      media_type: String,  // image | audio | video
      width: Int, height: Int, n_frames: Int, duration_ms: Long)

  final case class MediaFeature(
      media_ref: String, media_type: String,
      width: Int, height: Int, n_frames: Int,
      feature: Array[Float])

  /** STUB decode: deterministic pseudo-metadata + a 8-dim fake feature
    * vector derived from the media_ref hash. Replace the body with a real
    * codec call (same signature) when codecs are available.
    */
  def fakeDecode(mediaRef: String): MediaFeature = {
    var h = mediaRef.hashCode.toLong & 0xffffffffL
    def next(): Long = { h ^= h << 13; h ^= h >>> 7; h ^= h << 17; h & 0x7fffffffL }
    val mt = (next() % 3) match {
      case 0 => "image"; case 1 => "audio"; case _ => "video"
    }
    val w = (224 + next() % 1824).toInt
    val ht = (224 + next() % 1056).toInt
    val frames = if (mt == "video") (24 + next() % 240).toInt
                 else if (mt == "image") 1 else 0
    val feat = Array.tabulate(8)(i => ((next() % 2000) - 1000) / 1000.0f)
    MediaFeature(mediaRef, mt, w, ht, frames, feat)
  }

  /** Batch feature extraction over a media_ref column: one decoder init
    * per partition (the expensive part with real codecs), rows streamed
    * through it.
    */
  def extractFeatures(refs: DataFrame): DataFrame = {
    val spark = refs.sparkSession
    import spark.implicits._
    refs.select("media_ref").as[String].mapPartitions { it =>
      // real impl: val decoder = Codec.open() — once per partition
      it.map(fakeDecode)
    }.toDF()
  }

  /** Frame sampling plan for video media: every `stride`-th frame index,
    * capped — pure plan-side arithmetic, the decode of each sampled frame
    * would run in the partition-local stage.
    */
  def sampleFrames(features: DataFrame, stride: Int = 30, maxFrames: Int = 8): DataFrame =
    features.filter(col("media_type") === "video")
      .withColumn("sampled_frames",
        slice(sequence(lit(0), col("n_frames") - 1, lit(stride)), 1, maxFrames))
      .select(col("media_ref"), col("n_frames"), col("sampled_frames"))
}
