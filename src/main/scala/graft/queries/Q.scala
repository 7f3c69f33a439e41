package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared helpers for the SparkEntry query battery.
  *
  * Oracle-exactness rules (driver hash-compares against DuckDB on the same
  * parquet, see /root/repo/BASELINE.md t2):
  *   - Per-row arithmetic stays in DOUBLE: IEEE-754 ops on identical inputs
  *     are bit-identical across engines.
  *   - Aggregation casts each row to DECIMAL(20,6) first (scale 6 is
  *     load-bearing — see dsum): decimal addition is exact and associative,
  *     so the sum is independent of partition/order — the same value DuckDB
  *     computes single-threaded.
  *   - Final results cast back to DOUBLE so output schemas are plain.
  *   - Every query carries a total ORDER BY (deterministic row set).
  */
object Q {
  /** Read one fixture table of the TPC-H-ish star schema (TESTDATA.md).
    *
    * `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 rejects by
    * default; `nanosAsLong` surfaces it as a LongType of epoch-nanoseconds,
    * which is what the µs-exact time arithmetic wants anyway (`ts div 1000`
    * ≡ DuckDB `epoch_us(ts)`).
    */
  // Weak keys on the session so a stopped SparkSession's cached plans
  // become GC-able in a long-lived JVM. The inner map's DataFrames
  // strongly reference their SparkSession — held directly as the entry
  // value they would keep the weak key strongly reachable forever — so
  // the value is a SoftReference to the inner map: the only path from
  // this cache to the session is then soft, and once user code drops the
  // session the GC clears the soft ref under pressure and the weak entry
  // follows. A spuriously cleared soft ref just rebuilds the (cheap) map.
  private type PlanMap =
    java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]
  private val planCache =
    new java.util.WeakHashMap[SparkSession, java.lang.ref.SoftReference[PlanMap]]()

  private def plansFor(spark: SparkSession): PlanMap = planCache.synchronized {
    Option(planCache.get(spark)).flatMap(r => Option(r.get)).getOrElse {
      val m = new PlanMap
      planCache.put(spark, new java.lang.ref.SoftReference(m))
      m
    }
  }

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Memoize the DataFrame handle (the analyzed plan, NOT the data):
    // repeated queries skip re-listing files and re-reading footers, the
    // same way a catalog would hold a resolved table handle.
    plansFor(spark).computeIfAbsent((dir, name),
      _ => spark.read.parquet(s"$dir/$name.parquet"))
  }

  /** Memoize a derived (usually persisted) DataFrame per (session, dir).
    * Needed where CacheManager's canonical-plan dedup can't kick in: a
    * typed mapPartitions embeds a fresh closure object per call, so two
    * builds of the "same" pipeline never canonicalize equal — sharing must
    * happen at the handle level.
    */
  private[queries] def memo(spark: SparkSession, dir: String, key: String)(
      mk: => DataFrame): DataFrame =
    plansFor(spark).computeIfAbsent((dir, s"#$key"), _ => mk)

  /** Exact, order-independent sum of a money-grade double expression.
    *
    * Scale 6 matters: fixture money columns carry exactly 2 decimals, so any
    * product of up to three of them is an exact 6-decimal value. The double
    * approximation is far closer to that lattice point than half a step, so
    * the cast recovers it exactly in BOTH engines — no rounding-tie (HALF_UP
    * vs binary) divergence, which scale 4 did exhibit.
    */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(20, 6))).cast("double")

  /** Deterministic average: exact decimal sum, one double division. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Oracle-side equivalents (DuckDB ANSI SQL). */
  def oSum(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL(20,6))) AS DOUBLE)"
  def oAvg(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL(20,6))) AS DOUBLE) / COUNT($e)"
}
