package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Nonparametric quality-signal fusion: convert each integer signal to
  * its corpus percentile rank and fuse by mean rank — the scale-free
  * alternative to hand-weighted quality scores (a weighted sum is
  * dominated by whichever signal has the widest raw range; ranks make
  * "bottom 1% by repetition" and "bottom 1% by length" the same size
  * before they are averaged). The bottom of the fused order is the
  * curation review queue.
  *
  * Scale shape (the Robust.cutoffsFp discipline): each signal's rank
  * table is ONE value-keyed count aggregate plus a cumulative window
  * over DISTINCT VALUES — bounded by the signal's value grid (ppm
  * signals: ≤10⁶+1 rows; token counts: the longest doc), never by
  * corpus rows — then joined back on the value. All integer
  * arithmetic: rank_ppm(v) = ⌊10⁶·#{x ≤ v}/N⌋.
  */
object RankFusion {

  /** `(v, rank_ppm)` for one signal column named `v` — the
    * distinct-value cumulative rank table described above. */
  private[graft] def rankTable(vals: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    vals.groupBy(col("v")).agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(w))
      .crossJoin(broadcast(vals.agg(count(lit(1)).as("n"))))
      // decimal: cum · 10⁶ would wrap a bigint near 9.2e12 rows
      .select(col("v"),
        expr("""cast(cast(cum as decimal(38,0)) * 1000000
          |  div cast(n as decimal(38,0)) as bigint)""".stripMargin)
          .as("rank_ppm"))
  }

  /** Fuse the integer `signalCols` of `docs` (one row per doc, signals
    * already computed and null-free) by mean percentile rank. Output:
    * `(doc_id, rank_<sig>... , fused_ppm)`. The base projection is
    * persisted — it feeds every rank table plus the final join. */
  def fuse(docs: DataFrame, idCol: String,
      signalCols: Seq[String]): DataFrame = {
    require(signalCols.nonEmpty, "need at least one signal")
    val base = Caches.persistTracked(docs.select(
      col(graft.Names.quoted(idCol)).as("doc_id") +:
        signalCols.map(c => col(graft.Names.quoted(c)).cast("bigint").as(c)): _*))
    val joined = signalCols.foldLeft(base) { (acc, c) =>
      acc.join(
        rankTable(base.select(col(c).as("v")))
          .withColumnRenamed("rank_ppm", s"rank_$c")
          .withColumnRenamed("v", s"__v_$c"),
        col(c) === col(s"__v_$c"))
        .drop(s"__v_$c")
    }
    val rankCols = signalCols.map(c => col(s"rank_$c"))
    joined.select(col("doc_id") +: rankCols :+
      expr(s"cast((${signalCols.map(c => s"rank_$c").mkString(" + ")})" +
        s" div ${signalCols.size} as bigint)").as("fused_ppm"): _*)
  }
}
