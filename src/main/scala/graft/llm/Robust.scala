package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust-statistics operators over fixed-point values — the exact
  * order-statistic machinery q145 pins, exposed so batch and
  * streaming consumers share one implementation. */
object Robust {

  /** Per-group exact (loQ, hiQ) cutoffs in the q40 ceil-rank
    * convention: the smallest value whose cumulative count reaches
    * ceil(q·n), computed over the (group, value) counting aggregate —
    * bounded by distinct values per group, never a corpus sort.
    * Returns one row per group: (group, lo_fp, hi_fp). */
  def cutoffsFp(df: DataFrame, groupCol: Column, valueFpCol: Column,
      loQ: Double, hiQ: Double): DataFrame = {
    require(loQ > 0.0 && hiQ < 1.0 && loQ < hiQ,
      "quantiles must satisfy 0 < loQ < hiQ < 1")
    val v = df.select(groupCol.as("__g"), valueFpCol.as("__v"))
    val counts = v.groupBy(col("__g"), col("__v")).agg(count(lit(1)).as("__c"))
    val wCum = Window.partitionBy(col("__g")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts.withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__n", sum(col("__c")).over(Window.partitionBy(col("__g"))))
      .groupBy(col("__g"))
      .agg(
        min(when(col("__cum") >= expr(s"cast(ceil($loQ * __n) as bigint)"),
          col("__v"))).as("lo_fp"),
        min(when(col("__cum") >= expr(s"cast(ceil($hiQ * __n) as bigint)"),
          col("__v"))).as("hi_fp"))
      .withColumnRenamed("__g", "group_key")
  }

  /** Clip a value column against per-group cutoffs: every input row
    * survives with `(clipped_fp, was_clipped)`; groups with no
    * cutoffs (unseen at training) pass through unclipped. A pure
    * stateless projection + one broadcastable join — runs unchanged
    * under Structured Streaming against static cutoffs. */
  def clipFp(df: DataFrame, groupCol: Column, valueFpCol: Column,
      cutoffs: DataFrame): DataFrame = {
    val keyed = df.withColumn("__g", groupCol).withColumn("__v", valueFpCol)
    keyed.join(broadcast(cutoffs.withColumnRenamed("group_key", "__g")),
        Seq("__g"), "left")
      .withColumn("clipped_fp",
        when(col("lo_fp").isNull, col("__v"))
          .otherwise(greatest(least(col("__v"), col("hi_fp")), col("lo_fp"))))
      .withColumn("was_clipped", coalesce(
        col("__v") < col("lo_fp") || col("__v") > col("hi_fp"), lit(false)))
      .drop("__g", "__v", "lo_fp", "hi_fp")
  }
}
