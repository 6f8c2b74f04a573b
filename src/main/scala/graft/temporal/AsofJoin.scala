package graft.temporal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, the right row with the
  * greatest timestamp ≤ the left row's timestamp, per key.
  *
  * Spark has no as-of join operator; the naive formulations are a
  * range self-join (candidate blowup quadratic in per-key density) or
  * a broadcast of the right side (dies when both sides scale). This is
  * the merge formulation instead: tag and union both sides, one
  * shuffle on the key, one in-partition sort by (ts, side, tie), and a
  * running `last(right_payload, ignoreNulls)` window — every left row
  * reads its match from the running state. Cost is the sort-shuffle of
  * |L|+|R| rows: linear, skew-bounded by per-key volume, no candidate
  * pairs ever materialized, and Spark executes the window without an
  * extra exchange after the union's shuffle.
  *
  * Tie semantics (made explicit because engines differ): a right row
  * at exactly the left timestamp matches (inclusive); among right rows
  * sharing a timestamp the one with the greatest `tieCol` wins —
  * `tieCol` must be a unique id on the right side for the result to be
  * deterministic under any partitioning.
  */
object AsofJoin {

  /** Left columns pass through; the matched right row (all right
    * columns except the keys) lands in a nullable struct `asof` —
    * null when no right row is at or before the left timestamp. */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, tieCol: String): DataFrame = {
    val lPayloadCols = left.columns.filterNot(keys.contains).toSeq
    val rPayloadCols = right.columns.filterNot(keys.contains).toSeq
    val lpType = left.select(struct(lPayloadCols.map(col): _*).as("p")).schema("p").dataType
    val rpType = right.select(struct(rPayloadCols.map(col): _*).as("p")).schema("p").dataType
    // internal working columns must not shadow caller names (a key
    // literally named "_ts" would misbind) — pick collision-free ones
    val taken = (left.columns ++ right.columns).toSeq
    val tsC = graft.Names.fresh("_ts", taken)
    val tieC = graft.Names.fresh("_tie", taken)
    val sideC = graft.Names.fresh("_side", taken)
    val lpC = graft.Names.fresh("_lp", taken)
    val rpC = graft.Names.fresh("_rp", taken)
    def side(df: DataFrame, payloadCols: Seq[String], tag: Int,
        lp: Seq[String] => Column, rp: Seq[String] => Column): DataFrame =
      df.select(
        keys.map(col) ++ Seq(
          col(tsCol).as(tsC), col(tieCol).as(tieC), lit(tag).as(sideC),
          lp(payloadCols).as(lpC), rp(payloadCols).as(rpC)): _*)
    val l = side(left, lPayloadCols, 1,
      cs => struct(cs.map(col): _*), _ => lit(null).cast(rpType))
    val r = side(right, rPayloadCols, 0,
      _ => lit(null).cast(lpType), cs => struct(cs.map(col): _*))
    // rights sort before lefts at equal ts (inclusive match); equal-ts
    // rights resolve by tie asc, so the running last() keeps the max
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsC).asc, col(sideC).asc, col(tieC).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("asof", last(col(rpC), ignoreNulls = true).over(w))
      .filter(col(sideC) === 1)
      .select(keys.map(col) ++ lPayloadCols.map(c => col(s"$lpC.$c").as(c)) :+ col("asof"): _*)
  }
}
