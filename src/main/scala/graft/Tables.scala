package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet-backed table loader for the driver testdata layout
  * (`/root/testdata/sf&#42;/name.parquet`, see TESTDATA.md).
  *
  * Reads are plain `spark.read.parquet` so Catalyst's parquet source
  * handles column pruning + predicate pushdown; at cluster scale the
  * same call works over any hadoop-compatible FS path.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame   = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame   = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame   = apply(s, d, "region")
  /** `events.ts` is INT64 TIMESTAMP(NANOS) parquet, which Spark's
    * timestamp type (µs) cannot hold; read it as raw nanos and floor
    * to micros. True floored division (`(ts - pmod(ts,1000)) div 1000`,
    * not truncation) mirrors the oracle's `epoch_ns(ts)//1000` even for
    * pre-1970 timestamps. Requires
    * `spark.sql.legacy.parquet.nanosAsLong=true` at session build (set
    * by `Sessions.builder`; mutating it here per-read would be a hidden
    * session-global side effect).
    */
  def events(s: SparkSession, d: String): DataFrame =
    apply(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("(ts - pmod(ts, 1000)) div 1000")))
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
