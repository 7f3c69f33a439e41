package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Round-11 pins: the q38 moment-combination overflow found by the sf100
  * pass, and the gauge listener's max semantics.
  */
class Round11OpsSpec extends SparkSpec {
  import spark.implicits._

  test("q38 moment combination survives n*sxx past 2^63 (sf100 overflow pin)") {
    // 3 rows with x ~ 1.5e9: sxx ≈ 6.75e18 still fits BIGINT (the sums
    // themselves are safe to ~10^15 real rows), but the old n * sxx
    // combination (2.0e19) crossed 2^63 and threw ARITHMETIC_OVERFLOW
    // under ANSI — the exact failure the sf100 battery surfaced at
    // 2e8-row groups. The DECIMAL(38,0) widening must return the
    // exact-arithmetic double instead.
    val dir = Files.createTempDirectory("q38-overflow-").toString
    val xs = Seq(1500000000L, 1500000001L, 1500000002L)
    val ys = Seq(1L, 2L, 3L)
    xs.zip(ys).map { case (x, y) => ("A", x, y) }
      .toDF("l_returnflag", "l_quantity", "l_linenumber")
      .write.parquet(s"$dir/lineitem.parquet")
    val row = SparkEntry.queries("q38_exact_stats")(spark, dir).collect()
    assert(row.length == 1)
    // exact BigInt recomputation, rounded once to double — the same
    // arithmetic the widened query (and the HUGEINT oracle) performs
    val n = BigInt(3)
    val sx = xs.map(BigInt(_)).sum
    val sy = ys.map(BigInt(_)).sum
    val sxx = xs.map(x => BigInt(x) * x).sum
    val syy = ys.map(y => BigInt(y) * y).sum
    val sxy = xs.zip(ys).map { case (x, y) => BigInt(x) * y }.sum
    val varQ = (BigDecimal(n * sxx - sx * sx) / BigDecimal(n * (n - 1))).toDouble
    val corr = (BigDecimal(n * sxy - sx * sy).toDouble /
      (math.sqrt(BigDecimal(n * sxx - sx * sx).toDouble) *
        math.sqrt(BigDecimal(n * syy - sy * sy).toDouble)))
    val r = row.head
    assert(r.getString(0) == "A" && r.getLong(1) == 3L)
    assert(r.getLong(2) == sx.toLong)
    assert(math.abs(r.getDouble(3) - varQ) <= math.ulp(varQ) * 4,
      s"var_qty ${r.getDouble(3)} != $varQ")
    assert(math.abs(r.getDouble(5) - corr) <= math.ulp(corr) * 4,
      s"corr ${r.getDouble(5)} != $corr")
  }

  test("metrics listener peak-task gauge is a resettable max, not a sum") {
    val l = new TaskMetricsListener
    // no tasks yet: reset returns 0 and stays 0
    assert(l.peakTaskMemSinceReset() == 0L)
    assert(l.peakTaskMemSinceReset() == 0L)
  }
}
