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
  /** `events.ts` has shipped in two parquet layouts across testdata
    * generations; normalize both to a µs TIMESTAMP (UTC session, so
    * values match the DuckDB oracle's naive-timestamp read):
    *  - INT64 TIMESTAMP(NANOS), which Spark's µs timestamp cannot hold
    *    — surfaces as LongType under
    *    `spark.sql.legacy.parquet.nanosAsLong=true` (set at session
    *    build by `Sessions.builder`; mutating it here per-read would be
    *    a hidden session-global side effect). Floor nanos to micros
    *    with true floored division (`(ts - pmod(ts,1000)) div 1000`,
    *    not truncation), mirroring the oracle's `epoch_ns(ts)//1000`
    *    even for pre-1970 timestamps.
    *  - INT64 TIMESTAMP(MICROS, isAdjustedToUTC=false) — surfaces as
    *    TIMESTAMP_NTZ; a plain cast reinterprets the naive value as
    *    session-zone (UTC) instant, value-identical to the nanos path.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          timestamp_micros(expr("(ts - pmod(ts, 1000)) div 1000")))
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
