package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the q17/q18/q25 frozen oracles (banded-minhash pairs, simhash
  * pairs, DetectMime distribution) to fresh sf0.01 runs — the same
  * drift guard X03FrozenSpec provides for x03: a corpus, hash-seed, or
  * detector change must update the SparkEntry.oracleSql tables.
  */
class FrozenOraclesSpec extends AnyFunSuite {

  private val Row = """\(([^)]+)\)""".r

  private def frozenRows(name: String): Set[Vector[String]] = {
    val sql = SparkEntry.oracleSql(name)
    val body = sql.substring(sql.indexOf("VALUES") + 6, sql.lastIndexOf(") AS t("))
    Row.findAllMatchIn(body)
      .map(_.group(1).split(",").map { f =>
        val v = f.trim.stripPrefix("'").stripSuffix("'")
        if (v == "NULL") "null" else v // SQL NULL ≡ Spark null cell
      }.toVector)
      .toSet
  }

  private def fresh(name: String): Set[Vector[String]] = {
    val spark = TestSpark.spark
    SparkEntry.queries(name)(spark, "/root/testdata/sf0.01").collect()
      .map(_.toSeq.map {
        case d: Double => d.toString
        case x => String.valueOf(x)
      }.toVector).toSet
  }

  for (q <- Seq("q17_minhash_lsh", "q18_simhash_neardups",
      "q20_ann_lsh", "q28_ann_ivf_recall",
      "q31_embedding_neardups_lsh", "q33_minhash_quality",
      "q25_detect_mime_expr", "q21_media_features",
      "x08_media_meta", "x09_span_stats", "x10_embedded_stats",
      "x11_main_content_stats", "x12_unpack_stats",
      "q23_extract_compare", "x13_rmeta_stats", "x14_extract_stats",
      "x15_projection_stats",
      // r5: row-level faces frozen row-for-row (resource-backed VALUES)
      "x01_extract_all", "x02_spans_flat", "x05_embedded_tree",
      "x06_unpack", "x04_html_main_content", "x07_rmeta",
      "q24_projections")) {
    test(s"$q frozen oracle matches a fresh sf0.01 run") {
      val expected = frozenRows(q)
      val got = fresh(q)
      assert(expected.nonEmpty)
      assert(expected == got,
        s"frozen-table drift; missing=${expected -- got} extra=${got -- expected}")
    }
  }
}
