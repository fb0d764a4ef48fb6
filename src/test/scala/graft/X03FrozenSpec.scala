package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins x03's detection distribution over the 4000-doc sf0.01 corpus to
  * the frozen table that serves as its DuckDB oracle — any corpus or
  * detector change must update BOTH (SparkEntry.oracleSql x03 entry).
  */
class X03FrozenSpec extends AnyFunSuite {
  test("x03 frozen oracle matches a fresh 4000-doc extraction") {
    val spark = TestSpark.spark
    val got = SparkEntry.queries("x03_detect_mime_stats")(spark, "/root/testdata/sf0.01")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val sql = SparkEntry.oracleSql("x03_detect_mime_stats")
    val Row = """\('([^']+)', '([^']+)', (\d+)\)""".r
    val expected = Row.findAllMatchIn(sql)
      .map(m => (m.group(1), m.group(2), m.group(3).toLong)).toSet
    assert(expected.nonEmpty)
    val missing = expected -- got
    val extra = got -- expected
    assert(missing.isEmpty && extra.isEmpty,
      s"frozen-table drift; missing=$missing extra=$extra")
  }
}
