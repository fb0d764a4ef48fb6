package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins q32's frozen HLL++ estimate (the `31` literal in its oracle
  * SQL) to a fresh sf0.01 run. The exact side of the oracle is computed
  * genuinely by DuckDB; only the engine-specific sketch value is
  * frozen, and this spec is the drift guard for it — a tokenizer or
  * corpus change must update the literal.
  */
class SketchFrozenSpec extends AnyFunSuite {
  test("q32 frozen sketch estimate matches a fresh sf0.01 run") {
    val spark = TestSpark.spark
    val rows = SparkEntry.queries("q32_distinct_sketch")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rows.length == 1)
    val (nExact, nApprox, relErr) =
      (rows(0).getLong(0), rows(0).getLong(1), rows(0).getDouble(2))
    val frozen = """CAST\((\d+) AS BIGINT\) AS n_approx""".r
      .findFirstMatchIn(SparkEntry.oracleSql("q32_distinct_sketch"))
      .map(_.group(1).toLong)
    assert(frozen.contains(nApprox),
      s"frozen sketch drift: oracle literal=$frozen fresh=$nApprox")
    // the rel_error column must be derivable from the two counts the
    // same way the oracle SQL derives it
    val expectErr = BigDecimal(math.abs(nApprox - nExact).toDouble /
      math.max(nExact, 1L)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(relErr == expectErr)
  }
}
