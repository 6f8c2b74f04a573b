package graft.temporal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) joins via time bucketing.
  *
  * An inequality predicate like `r.ts ∈ [l.ts − W, l.ts)` gives Spark
  * no equi-join key, so Catalyst falls back to broadcast-nested-loop —
  * quadratic work and a broadcast that cannot scale. Bucketing
  * restores an equi-join: quantize timestamps to `ts div W`; a
  * half-open window of width W can only overlap the left row's bucket
  * and the one before it, so the left side explodes into exactly two
  * probe rows and joins on (key, bucket). Each in-window right row is
  * met exactly once (its bucket is one of the two probes), so no
  * dedup pass is needed before aggregation. Shuffle volume: 2|L|+|R|
  * rows keyed on (key, bucket) — linear, AQE-skew-splittable, no
  * nested loop anywhere.
  *
  * Bucketing uses integer `div` (not `/`, which is double division in
  * Spark and loses exactness for large epoch-microsecond values).
  */
object RangeJoin {

  /** Per left row: the count of right rows with the same key whose
    * `tsCol` lies in `[left.ts − windowUs, left.ts)` (strictly before
    * the left row). Left rows with no in-window right rows are kept
    * with count 0. Timestamps are non-negative integer microseconds.
    *
    * PRECONDITION: left rows must be distinct (carry a unique id) —
    * the final regroup keys on all left columns, so exact-duplicate
    * left rows would collapse into one row with a summed count. */
  def countPreceding(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, windowUs: Long): DataFrame = {
    // bucket/right-ts working columns must not shadow caller names
    val taken = (left.columns ++ right.columns).toSeq
    val bC = graft.Names.fresh("_b", taken)
    val rtsC = graft.Names.fresh("_rts", taken)
    val probes = left.withColumn(bC,
      explode(array(expr(s"(`$tsCol` div ${windowUs}L) - 1L"),
        expr(s"`$tsCol` div ${windowUs}L"))))
    val r = right.select(
      keys.map(col) :+ expr(s"`$tsCol` div ${windowUs}L").as(bC)
        :+ col(tsCol).as(rtsC): _*)
    val joinCond = keys.map(k => probes(k) === r(k)).reduce(_ && _) &&
      probes(bC) === r(bC) &&
      r(rtsC) >= probes(tsCol) - windowUs && r(rtsC) < probes(tsCol)
    val lCols = left.columns.toSeq
    probes.join(r, joinCond, "left")
      // the two probe rows per left row regroup here; count of the
      // right-ts column ignores the null row of a match-less probe,
      // so no dedup needed
      .groupBy(lCols.map(probes(_)): _*)
      .agg(count(r(rtsC)).as("n_in_window"))
  }
}
