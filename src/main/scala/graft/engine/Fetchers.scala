package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** External payload fetchers — the tika-pipes fetcher surface
  * (tika-core .../pipes/fetcher/FetcherManager.java + the
  * fetcher-file-system module's FileSystemFetcher) re-expressed as a
  * partition-local resolve stage: rows whose `media_ref` scheme has a
  * registered fetcher get their missing `payload` filled IN the
  * executor (one fetcher init per partition, streamed rows — never a
  * driver-side loop), so downstream decode runs on real bytes.
  */
object Fetchers {

  /** A scheme-bound resolver. Implementations must be Serializable —
    * they ship inside the mapPartitions closure.
    */
  trait Fetcher extends Serializable {
    def scheme: String // matches media_ref "<scheme>://..."
    def fetch(ref: String): Option[Array[Byte]]
  }

  /** Filesystem fetcher jailed to a root directory (the reference's
    * FileSystemFetcher with its basePath + extract-traversal guard,
    * fetcher-file-system module FileSystemFetcher.java).
    */
  final class FsFetcher(rootDir: String) extends Fetcher {
    val scheme = "fs"
    def fetch(ref: String): Option[Array[Byte]] = {
      val rel = ref.stripPrefix("fs://")
      val root = java.nio.file.Path.of(rootDir).toAbsolutePath.normalize
      val p = root.resolve(rel).normalize
      if (!p.startsWith(root)) None // ../ traversal out of the jail
      else if (!java.nio.file.Files.isRegularFile(p)) None
      else Some(java.nio.file.Files.readAllBytes(p))
    }
  }

  /** Deterministic blob-store stand-in for the sandbox: blob:// refs
    * resolve to REAL media container bytes (PNG/WAV/GIF built by the
    * corpus generators, seeded by the ref), so the decode stage runs
    * its real parse path end-to-end. A production deployment swaps
    * this for an object-store fetcher with the same trait.
    */
  final class CorpusBlobFetcher extends Fetcher {
    val scheme = "blob"
    def fetch(ref: String): Option[Array[Byte]] = {
      val r = new scala.util.Random(ref.hashCode.toLong & 0xffffffffL)
      val bytes = (r.nextInt(3)) match {
        case 0 => graft.corpus.MediaCorpus.png(r)
        case 1 => graft.corpus.MediaCorpus.wav(r)
        case _ => graft.corpus.MediaCorpus.gif(r)
      }
      Some(bytes)
    }
  }

  /** Fill missing payloads from the registered fetchers. Rows with a
    * payload pass through untouched; unresolvable schemes stay null
    * (downstream decides — q21's stub decode is now reachable only for
    * those). Expects (media_ref string, payload binary?) columns.
    */
  def resolvePayloads(refs: DataFrame, fetchers: Seq[Fetcher]): DataFrame = {
    val spark = refs.sparkSession
    import spark.implicits._
    val withPayload = if (refs.columns.contains("payload")) refs
                      else refs.withColumn("payload", lit(null).cast("binary"))
    withPayload.select(col("media_ref"), col("payload"))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        // fetcher init once per partition (the reference scopes fetcher
        // lifecycle the same way: one plugin instance per pipes worker)
        val bound = fetchers.map(f => f.scheme -> f).toMap
        it.map { case (ref, payload) =>
          if (payload != null && payload.nonEmpty) (ref, payload)
          else {
            val scheme = ref.indexOf("://") match {
              case -1 => ""
              case i => ref.substring(0, i)
            }
            (ref, bound.get(scheme).flatMap(_.fetch(ref)).orNull)
          }
        }
      }.toDF("media_ref", "payload")
  }
}
