package graft.llm

import org.apache.spark.sql.DataFrame

/** Scale-adaptive minimum-parallelism guard for compute-heavy map
  * phases (tokenize, shingle, minhash, rule folds).
  *
  * The bench corpora are single-file, single-row-group parquet, so a
  * scan can never run as more than one task — and every per-row fold
  * stacked above it (shingle_bases over 128 hashes, the rule mask,
  * NB tokenize) runs serial no matter how many cores the session has
  * (measured: the q278 truth join ran its 4.5 s of verify work on the
  * arrival scan's single partition). A production layout has
  * thousands of splits, so an unconditional repartition would pay a
  * full payload shuffle exactly where the scan is already parallel
  * (guide §8: never move heavy bytes for free).
  *
  * The guard therefore fires only when BOTH hold:
  *   - the scan has fewer files than `defaultParallelism` (driver
  *     metadata via `inputFiles` — no job, no AQE stage run), and
  *   - the per-core share of input bytes is under [[MinBytesPerCore]]
  *     (the scan is scheduling-dominated, so one small shuffle buys
  *     real parallelism).
  * On any metadata failure it assumes "big" and stays a no-op — the
  * conservative direction at scale. Row placement is semantics-free
  * for every consumer (aggregates / keyed joins only; no
  * partition-id-dependent expression exists in main — grep-audited).
  */
object Spread {
  /** Below this per-core input share the scan is scheduling-bound and
    * the repartition shuffle is trivially cheap. */
  val MinBytesPerCore: Long = 4L * 1024 * 1024

  def apply(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val files =
      try df.inputFiles
      catch { case _: Throwable => return df }
    if (files.length >= target || target <= 1) return df
    val bytes =
      try {
        val conf = spark.sparkContext.hadoopConfiguration
        files.map { f =>
          val p = new org.apache.hadoop.fs.Path(f)
          p.getFileSystem(conf).getFileStatus(p).getLen
        }.sum
      } catch { case _: Throwable => Long.MaxValue }
    if (bytes / target < MinBytesPerCore) df.repartition(target) else df
  }

  /** Keyed variant for CPU-heavy JOIN/aggregate stages: pre-partition
    * by the operation's own key so the exchange both satisfies the
    * join's distribution requirement AND — being a user repartition —
    * is exempt from AQE partition coalescing, which sizes partitions
    * by BYTES and serializes small-but-CPU-heavy stages (measured:
    * q220's gram self-join ran 0.7 s faster with coalescing off).
    * Same scale guard as [[apply]]: no-op unless the scan is
    * few-files AND tiny, so a production-sized input keeps AQE's
    * byte-based sizing. */
  def byKey(df: DataFrame, keys: org.apache.spark.sql.Column*): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val files =
      try df.inputFiles
      catch { case _: Throwable => return df }
    if (files.length >= target || target <= 1) return df
    val bytes =
      try {
        val conf = spark.sparkContext.hadoopConfiguration
        files.map { f =>
          val p = new org.apache.hadoop.fs.Path(f)
          p.getFileSystem(conf).getFileStatus(p).getLen
        }.sum
      } catch { case _: Throwable => Long.MaxValue }
    if (bytes / target < MinBytesPerCore) df.repartition(target, keys: _*)
    else df
  }
}
