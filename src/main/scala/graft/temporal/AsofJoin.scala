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
    def side(df: DataFrame, payloadCols: Seq[String], tag: Int,
        lp: Seq[String] => Column, rp: Seq[String] => Column): DataFrame =
      df.select(
        keys.map(col) ++ Seq(
          col(tsCol).as("_ts"), col(tieCol).as("_tie"), lit(tag).as("_side"),
          lp(payloadCols).as("_lp"), rp(payloadCols).as("_rp")): _*)
    val l = side(left, lPayloadCols, 1,
      cs => struct(cs.map(col): _*), _ => lit(null).cast(rpType))
    val r = side(right, rPayloadCols, 0,
      _ => lit(null).cast(lpType), cs => struct(cs.map(col): _*))
    // rights sort before lefts at equal ts (inclusive match); equal-ts
    // rights resolve by tie asc, so the running last() keeps the max
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts").asc, col("_side").asc, col("_tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("asof", last(col("_rp"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(keys.map(col) ++ lPayloadCols.map(c => col(s"_lp.$c").as(c)) :+ col("asof"): _*)
  }
}
