package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic bootstrap uncertainty for corpus statistics — the
  * Poisson-bootstrap spelling that needs no global coordination
  * (Chamandy et al. 2012, "Estimating Uncertainty for Massive Data
  * Streams"): instead of resampling n rows with replacement (a global
  * draw), each row enters replicate b with weight w ~ Poisson(1),
  * independently per (row, replicate) — the replicate totals then
  * differ from a true multinomial resample by O(1/√n), which is the
  * bootstrap's own noise floor.
  *
  * The weights here are DERIVED, not drawn: u = md5(key|b) mod 10⁹
  * inverted through Poisson(1)'s CDF on a fixed 10⁻⁹ grid — the q103
  * md5-priority discipline, so the "randomness" is coordination-free,
  * reproducible across engines/runs/partitionings, and exactly
  * replayable by the DuckDB oracle: both engines compare the same
  * integer against the same eight literal thresholds.
  *
  * Scale shape: the (row × replicate) explode never materializes —
  * map-side partial aggregation collapses it to `reps` rows per
  * partition before the shuffle, so the wire cost is reps ×
  * partitions rows and the result frame is reps rows, whatever the
  * corpus size.
  */
object Bootstrap {

  /** ⌊10⁹ · P(Poisson(1) ≤ k)⌋ for k = 0..7 — series-exact e⁻¹ at
    * 60-digit decimal precision, floored ONCE and committed as
    * literals (never recomputed from doubles at runtime; the spec
    * re-derives them within ±1). P(X > 7) ≈ 1.02·10⁻⁵ rides in the
    * top bucket, capping w at 8. */
  val PoissonCumPpb: Seq[Long] = Seq(367879441L, 735758882L, 919698602L,
    981011843L, 996340153L, 999405815L, 999916758L, 999989750L)

  /** The derived uniform for (key, rep): md5 first-60-bits mod 10⁹. */
  private def u9Expr: Column = expr(
    """cast(conv(substring(md5(concat(cast(k as string), '|',
      |  cast(rep as string))), 1, 15), 16, 10) as bigint)
      |  % 1000000000""".stripMargin)

  /** B replicate means of an integer statistic, in milli-units:
    * per replicate, ⌊1000·Σ(w·x) / Σw⌋ with w the derived Poisson
    * weight of (keyCol, rep). Null stats count as 0 (they still draw
    * weight — a row is a row). Output: (rep, n_eff, mean_mstat),
    * exactly `reps` rows. */
  def replicateMeans(df: DataFrame, keyCol: Column, statCol: Column,
      reps: Int): DataFrame = {
    require(reps > 0, "reps must be positive")
    val weighted = df
      .select(keyCol.as("k"), coalesce(statCol.cast("bigint"), lit(0L)).as("x"))
      .select(col("k"), col("x"),
        explode(expr(s"sequence(0, ${reps - 1})")).as("rep"))
      .withColumn("u9", u9Expr)
      .withColumn("w",
        PoissonCumPpb.map(t => when(col("u9") >= t, 1L).otherwise(0L))
          .reduce(_ + _))
    weighted.groupBy(col("rep").cast("bigint").as("rep"))
      .agg(sum(col("w")).cast("bigint").as("n_eff"),
        // the product is summed IN decimal(38,0) — a bigint sum
        // would wrap silently near 9.2e18 total stat mass
        expr("""cast(sum(cast(w * x as decimal(38,0))) * 1000
          |  div cast(greatest(sum(w), 1L) as decimal(38,0))
          |  as bigint)""".stripMargin).as("mean_mstat"))
  }
}
