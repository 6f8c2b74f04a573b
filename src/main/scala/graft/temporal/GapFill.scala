package graft.temporal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-axis densification (gap fill): telemetry aggregated per hour
  * has HOLES where nothing happened, and every downstream consumer of
  * a time series — anomaly detection, rate alerts, charting — needs
  * the zero rows to exist, not to be inferred. The operator
  * materializes the full (key × hour) grid over the observed span and
  * left-joins the real aggregates in, flagging the filled rows.
  *
  * 100 TB shape: the corpus-sized work is exactly the q9 hourly
  * aggregation; the axis is bounded by the SPAN (hours between min
  * and max), not the row count, and the key list by distinct keys —
  * their cross is a broadcast-sized grid by contract, guarded by
  * `maxAxisHours` (one absurd timestamp — a 1970 epoch default, a
  * year-9999 sentinel — would otherwise explode the axis; refusing
  * loudly beats a 10⁸-row cross). Two scalars reach the driver for
  * the guard (the bounded-collect precedent). */
object GapFill {

  /** Hourly counts per key over the dense hour axis: `(key, hour_ts,
    * n_events, is_gap)` for every key × hour in the observed span.
    * Rows with null timestamps drop out (no hour), the standard
    * unscorable contract. */
  def hourlyCounts(df: DataFrame, keyCol: String, tsCol: String,
      maxAxisHours: Long = 200000L): DataFrame = {
    require(maxAxisHours > 0, "maxAxisHours must be positive")
    val q = graft.Names.quoted _
    val hourly = df
      .groupBy(col(q(keyCol)).as("key"),
        date_trunc("hour", col(q(tsCol))).as("hour_ts"))
      .agg(count(lit(1)).as("n_events"))
    val bounds = hourly.agg(min(col("hour_ts")).as("mn"), max(col("hour_ts")).as("mx"))
    val b = bounds.head()
    if (b.isNullAt(0)) {
      // no timestamped rows at all → empty result, correct schema
      return hourly.select(col("key"), col("hour_ts"), col("n_events"),
        lit(false).as("is_gap")).limit(0)
    }
    val spanHours = (b.getTimestamp(1).getTime - b.getTimestamp(0).getTime) / 3600000L
    require(spanHours < maxAxisHours,
      s"time axis spans $spanHours hours (≥ $maxAxisHours): a corrupt " +
        "timestamp would explode the grid — clean or clamp the input first")
    val axis = bounds.select(
      explode(expr("sequence(mn, mx, interval 1 hour)")).as("hour_ts"))
    val keys = df.select(col(q(keyCol)).as("key")).distinct()
    keys.crossJoin(broadcast(axis))
      .join(hourly, Seq("key", "hour_ts"), "left")
      .select(col("key"), col("hour_ts"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("n_events").isNull.as("is_gap"))
  }
}
