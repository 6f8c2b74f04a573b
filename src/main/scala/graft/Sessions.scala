package graft

import org.apache.spark.sql.SparkSession

/** Single place to construct engine SparkSessions so every entry point
  * (Verify, Bench, Smoke, tests) runs with identical semantics.
  *
  * Session-level settings (deliberately NOT mutated at read time —
  * see `Tables.events`):
  *  - `spark.sql.legacy.parquet.nanosAsLong`: the `events` table is
  *    INT64 TIMESTAMP(NANOS) parquet, which Spark's µs timestamp cannot
  *    hold; read the raw nanos as LongType instead.
  *  - UTC session timezone: keeps timestamp arithmetic aligned with the
  *    DuckDB oracle.
  *  - AQE on (Spark default) handles runtime join-strategy selection and
  *    skew splitting — the scale path relies on it instead of hints.
  */
object Sessions {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // static conf: installs the native Catalyst expressions
      // (get_wkb_geom_type, dot_fp) in every session of the app —
      // the same line a cluster deploy puts in spark-defaults.conf
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")

  /** local[$cpus] session sized from SPARK_GRAFT_CPUS (driver contract). */
  def local(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    builder(s"local[$cpus]", cpus).getOrCreate()
  }
}
