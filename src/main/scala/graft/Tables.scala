package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Table loading + oracle-determinism helpers shared by all operators.
  *
  * Determinism contract: every query in [[SparkEntry.queries]] must produce
  * bit-identical values to its DuckDB oracle. Floating-point SUM/AVG are the
  * only non-deterministic spots (summation order differs between engines),
  * so money-like doubles are routed through an exact decimal accumulation
  * and only cast back to double at the end — both engines then produce the
  * exact same IEEE-754 bits.
  */
object Tables {

  /** Load one of the driver-generated tables from a scale-factor dir.
    *
    * `events.ts` is stored as parquet TIMESTAMP(NANOS), which Spark 4 does
    * not read natively; sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true` and the loader converts
    * the resulting nanos-since-epoch long to a microsecond timestamp
    * (documented ns→µs truncation, SURVEY §1.2).
    */
  private val loaded =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    // memoized per (session, dir, table): the driver testdata is immutable,
    // and a fresh spark.read.parquet pays file listing + footer schema
    // inference on EVERY call — pure plan metadata, so reuse is safe (the
    // query still scans the parquet at execution)
    loaded.computeIfAbsent((spark, dir, name), _ => {
      val df = spark.read.parquet(s"$dir/$name.parquet")
      if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        df.withColumn("ts", nanosToMicrosTs(col("ts")))
      else df
    })

  /** The ONE ns→µs conversion (documented deviation, SURVEY §1.2/§7.4.6):
    * the reference round-trips parquet TIMESTAMP(NANOS)
    * (ref:converter/RowDataConverter.java:228-231); Spark 4 has no ns
    * timestamp, so nanos-since-epoch longs truncate to the containing
    * microsecond. FLOOR division — arrow/DuckDB `//` semantics, so
    * pre-epoch nanos land in the earlier µs rather than rounding toward
    * zero — and integer `div`, not `/`: double division rounds large
    * nanos counts (±1µs drift vs DuckDB's exact epoch_us truncation).
    * Gate q50 pins this behavior against the DuckDB oracle; TruncSpec
    * pins the negative-nanos floor.
    */
  def nanosToMicrosTs(ns: Column): Column =
    // subtract the (always nonnegative) pmod remainder first, so the
    // truncating IntegralDivide lands on the FLOOR multiple for negatives
    timestamp_micros(call_function("div", ns - pmod(ns, lit(1000L)), lit(1000L)))

  /** Deterministic per-dataset scratch location inside the repo for
    * derived artifacts (inverted indexes, signature tables, roundtrip
    * datasets) — one sanitization rule for every operator.
    */
  def scratch(dir: String, name: String): String =
    s"target/graft-data/${dir.replaceAll("[^a-zA-Z0-9]", "_")}/$name"

  /** Exact sum of a double column with `scale` meaningful decimals:
    * accumulate as decimal (exact, order-insensitive), emit double.
    * Oracle equivalent: CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE).
    */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Exact mean: decimal sum divided by count in double arithmetic.
    * Oracle: CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE) / COUNT(x).
    */
  def davg(c: Column, scale: Int = 2): Column =
    dsum(c, scale) / count(c)
}
