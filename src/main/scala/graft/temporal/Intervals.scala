package graft.temporal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval-union aggregation: per key, merge overlapping [start, end)
  * intervals into islands and report how much of the axis they cover
  * and how deeply they stack. The third classic interval shape next to
  * the as-of join (point ← interval) and range join (interval count):
  * union semantics — SLA uptime, sensor-on time, concurrent-session
  * peaks — which naive `sum(end - start)` double-counts whenever
  * intervals overlap.
  *
  * Semantics are half-open: an interval touching the previous island's
  * end (`start == prev_end`) EXTENDS it ([0,5) ∪ [5,8) = [0,8)), and a
  * zero-length interval ([t,t)) contributes no coverage and no
  * concurrency. Negative-length rows (`end < start`) are invalid by
  * the unscorable-geometry precedent and are dropped, not clamped.
  *
  * 100 TB shape: both passes are per-key window scans — islands via
  * the gaps-and-islands cumulative `max(end)` walk, concurrency via a
  * ±1 boundary sweep with ends ordered before starts at equal stamps —
  * so work shuffles once on the key and never sorts globally. All
  * arithmetic is integer (caller supplies integer stamps, e.g.
  * microseconds), so results replay exactly in any engine. A single
  * pathological key serializes its own scan (windows are per-key by
  * nature); keys that hot need a time-chunked pre-merge upstream.
  */
object Intervals {

  /** Per-key union stats: `(key, n_intervals, n_islands, covered,
    * max_conc)` where `covered` is the union length in the caller's
    * integer unit and `max_conc` the peak number of concurrently open
    * intervals. */
  def coverage(df: DataFrame, keyCol: Column, idCol: Column,
      startCol: Column, endCol: Column): DataFrame = {
    val base = df.select(keyCol.as("k"), idCol.as("iid"),
        startCol.as("s"), endCol.as("e"))
      .filter(col("s").isNotNull && col("e").isNotNull && col("e") >= col("s"))
    val ord = Window.partitionBy(col("k")).orderBy(col("s"), col("e"), col("iid"))
    val prevEnd = max(col("e")).over(
      ord.rowsBetween(Window.unboundedPreceding, -1))
    val islands = base
      .withColumn("new_isl",
        when(prevEnd.isNull || col("s") > prevEnd, 1L).otherwise(0L))
      .withColumn("isl_id", sum(col("new_isl")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("k"), col("isl_id"))
      .agg(count(lit(1)).as("n"), min(col("s")).as("i_s"), max(col("e")).as("i_e"))
      .groupBy(col("k"))
      .agg(sum(col("n")).as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(col("i_e") - col("i_s")).as("covered"))
    // Boundary sweep: -1 (close) sorts before +1 (open) at equal
    // stamps, which is exactly the half-open contract. Within a tie
    // group all deltas are equal, so every permutation yields the same
    // prefix-sum multiset — the max is deterministic.
    val bounds = base.select(col("k"), col("s").as("ts"), lit(1L).as("d"))
      .unionAll(base.select(col("k"), col("e").as("ts"), lit(-1L).as("d")))
    val sweep = Window.partitionBy(col("k")).orderBy(col("ts"), col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val conc = bounds.withColumn("c", sum(col("d")).over(sweep))
      .groupBy(col("k")).agg(max(col("c")).as("max_conc"))
    islands.join(conc, Seq("k")).withColumnRenamed("k", "key")
  }
}
