package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.temporal.{AsofJoin, Funnel, Intervals, RangeJoin}

/** Temporal join queries over the `events` table: backward as-of join
  * and bucketed range join — the two interval-predicate shapes a
  * training-data/eventstream pipeline needs that Spark has no native
  * operator for. Both oracle-checked (DuckDB expresses them as plain
  * inequality joins + windows; the Spark side uses the scale
  * formulations from [[graft.temporal]]).
  */
object TemporalQueries {

  private val WindowUs = 300000000L // 5 minutes

  /** Events projected to integer microseconds (deterministic across
    * engines: the oracle mirrors with epoch_ns(ts)//1000). */
  private def ev(s: SparkSession, dir: String): DataFrame =
    graft.Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))

  // ---- q34: backward as-of join — purchase ← latest prior click ----
  def q34AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("us"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("us"))
    AsofJoin.asofBackward(purchases, clicks, Seq("user_id"), "us", "event_id")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("asof.event_id").as("click_id"),
        (col("us") - col("asof.us")).as("gap_us"))
  }

  // ---- q144: last-touch attribution (windowed as-of + channel rollup) ----
  // The marketing-analytics workhorse the funnel/transition cards
  // don't answer: WHICH channel gets credit for each purchase. Each
  // purchase takes its latest prior touch (view/click/signup) via the
  // q34 as-of machinery — the latest prior IS the closest, so the
  // attribution window is a post-filter, not a join blowup — and
  // falls back to 'direct' when the touch is stale or absent. Value
  // rides as floor(value·10⁴) fixed-point cents; the oracle replays
  // the inequality join + (us desc, event_id desc) pick + window
  // filter + rollup.
  private val AttrWindowUs = 172800000000L // 48 hours
  private val AttrTouches = Seq("view", "click", "signup")
  def q144Attribution(s: SparkSession, dir: String): DataFrame = {
    val e = graft.Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("value"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("us"),
        expr("cast(floor(value * 10000.0) as bigint)").as("v_fp"))
    val touches = e.filter(col("event_type").isin(AttrTouches: _*))
      .select(col("user_id"), col("event_id"), col("event_type"), col("us"))
    AsofJoin.asofBackward(purchases, touches, Seq("user_id"), "us", "event_id")
      .select(col("v_fp"),
        when(col("asof").isNotNull &&
            col("us") - col("asof.us") <= AttrWindowUs,
          col("asof.event_type")).otherwise(lit("direct")).as("channel"))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("v_fp")).as("attributed_fp"))
  }

  // ---- q150: time-decayed engagement score (recency weighting) ----
  // Popularity/engagement ranking needs recency decay, but float
  // 2^(-age/H) is libm-dependent and unreplayable. This is the
  // integer-exact form: weight = 10⁶ >> (age_days div halfLife),
  // clamped — a step-exponential that halves every halfLife days
  // using only shifts, identical in any engine. Anchor = the corpus
  // max day (data-derived, deterministic). One scan + one user
  // aggregation.
  private val DecayHalfLifeDays = 30L
  def q150DecayedEngagement(s: SparkSession, dir: String): DataFrame = {
    val e = graft.Tables.events(s, dir)
      .select(col("user_id"),
        expr("cast(floor(unix_micros(ts) / 86400000000.0) as bigint)")
          .as("day"))
    val maxDay = e.agg(max(col("day"))).collect()(0).getLong(0)
    e.select(col("user_id"),
        expr(s"shiftright(1000000L, cast(least(($maxDay" +
          s"L - day) div $DecayHalfLifeDays, 19L) as int))").as("wt"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("wt")).as("decay_score"))
  }

  // ---- q35: bucketed range join — events preceding each error ----
  def q35RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    val errors = e.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("us"))
    RangeJoin.countPreceding(errors, e.select(col("user_id"), col("us")),
      Seq("user_id"), "us", WindowUs)
      .select(col("event_id"), col("user_id"), col("n_in_window"))
  }

  // ---- q90: hourly gap fill (time-axis densification) ----
  // The q9 aggregation with its holes materialized: every (type, hour)
  // of the observed span exists, filled hours carry 0 and a flag. The
  // oracle regenerates the dense axis with generate_series and must
  // land on the identical grid.
  def q90GapFill(s: SparkSession, dir: String): DataFrame =
    graft.temporal.GapFill.hourlyCounts(
      graft.Tables.events(s, dir), "event_type", "ts")
      .select(col("key").as("event_type"), col("hour_ts"),
        col("n_events"), col("is_gap"))

  // ---- q95: interval-union coverage (uptime / concurrency) ----
  // Each event opens a deterministic 1–7-minute interval (length keyed
  // on event_id mod 7); per user the operator merges overlaps into
  // islands and reports union coverage and peak concurrency — the
  // numbers a naive sum(end-start) gets wrong whenever sessions
  // overlap. The oracle replays the identical gaps-and-islands walk
  // and ±1 boundary sweep.
  def q95IntervalCoverage(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    val iv = e.select(col("user_id"), col("event_id"), col("us").as("s"),
      (col("us") + (col("event_id") % 7 + 1) * 60000000L).as("e"))
    Intervals.coverage(iv, col("user_id"), col("event_id"), col("s"), col("e"))
      .select(col("key").as("user_id"), col("n_intervals"), col("n_islands"),
        col("covered").as("covered_us"), col("max_conc"))
  }

  // ---- q102: burst detection (peak sliding-window event rate) ----
  // The bot/abuse signal: per user, the maximum number of events in
  // any trailing 10-minute window. Composes q35's bucketed range join
  // (each event counts its half-open trailing window, +1 for itself)
  // with a per-user max — no per-user sort, no window over the raw
  // stream.
  private val BurstWindowUs = 600000000L // 10 minutes
  def q102Burst(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    RangeJoin.countPreceding(
        e.select(col("event_id"), col("user_id"), col("us")),
        e.select(col("user_id"), col("us")),
        Seq("user_id"), "us", BurstWindowUs)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("n_in_window")) + 1L).as("max_burst"))
  }

  // ---- q106: ordered funnel (view → click → purchase) ----
  // Conversion with ORDER enforced: each stage counts only strictly
  // after the user's previous-stage first reach. One filtered
  // aggregation + user-key join per stage — never a per-user sort.
  private val FunnelStages =
    Seq("view" -> "view", "click" -> "click", "purchase" -> "purchase")
  def q106Funnel(s: SparkSession, dir: String): DataFrame =
    Funnel.reach(ev(s, dir), "user_id", "event_type", "us", FunnelStages)
      .select(col("user").as("user_id"), col("view_us"), col("click_us"),
        col("purchase_us"), col("stage"))

  // ---- q110: event-type transition matrix (Markov counts) ----
  // The behavioral signature per event stream: for each consecutive
  // pair of a user's events, count (from → to) and its share of the
  // from-type's outgoing transitions. One lag window per user (the
  // q11 session machinery) into a type×type aggregate — the matrix is
  // |types|² rows however large the stream; share is an integer-ppm
  // window over those few rows.
  def q110Transitions(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    ev(s, dir).filter(col("us").isNotNull)
      .withColumn("to_et", lead(col("event_type"), 1).over(w))
      .filter(col("to_et").isNotNull)
      .groupBy(col("event_type").as("from_et"), col("to_et"))
      .agg(count(lit(1)).as("n"))
      .withColumn("share_ppm",
        expr("n * 1000000L div sum(n) over (partition by from_et)"))
  }

  // ---- q115: retention cohort matrix ----
  // The durability readout every event product ships: users grouped
  // by first-active day, then for each (cohort, day-offset) the count
  // of users still active. Integer epoch-days (no timezone, no
  // calendar drift between engines). Scale: one (user, day) distinct
  // — the only corpus-sized shuffle, keyed by user — then the cohort
  // min and the join both reuse that user partitioning (AQE
  // co-locates); the output is |days|² cells at most, driver-trivial.
  def q115Retention(s: SparkSession, dir: String): DataFrame = {
    val days = ev(s, dir).filter(col("us").isNotNull)
      .select(col("user_id"), expr("us div 86400000000").as("day"))
      .distinct()
    val cohort = days.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    days.join(cohort, "user_id")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  // ---- q121: day-of-week seasonality card ----
  // The load-shape readout behind capacity planning and anomaly
  // baselines: per (event_type, weekday) the event count, cent-exact
  // value mass, and the weekday's ppm share of its type. Weekday is
  // pure epoch-day arithmetic ((day + 4) % 7, 0 = Sunday — no calendar
  // functions, so both engines agree by construction). One corpus
  // aggregation; the share window runs on the |types|·7-row result.
  def q121Seasonality(s: SparkSession, dir: String): DataFrame = {
    val byCell = graft.Tables.events(s, dir).filter(col("ts").isNotNull)
      .select(col("event_type"),
        expr("(unix_micros(ts) div 86400000000L + 4) % 7").as("dow"),
        floor(col("value") * 100).cast("bigint").as("vc"))
      .groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("n"),
        sum(col("vc").cast("decimal(38,0)")).cast("bigint").as("value_cents"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("event_type"))
    byCell.withColumn("__tot", sum(col("n")).over(w))
      .select(col("event_type"), col("dow"), col("n"), col("value_cents"),
        expr("n * 1000000L div __tot").as("share_ppm"))
  }

  // ---- q127: seasonal anomaly days (dow-conditioned volume) ----
  // The alerting readout q121's baseline exists for: each
  // (event_type, day) volume judged against the floor-mean of ITS
  // weekday within its type — Monday traffic compared to Mondays, so
  // weekly rhythm doesn't false-alarm. All-integer (epoch-day dow,
  // floor-mean, ppm deviation); every day carries a verdict. The
  // corpus pays one (type, day) aggregation; baseline join and verdict
  // run on the days-sized frame.
  private val AnomalyThrPpm = 500000L
  def q127SeasonalAnomaly(s: SparkSession, dir: String): DataFrame = {
    val daily = ev(s, dir).filter(col("us").isNotNull)
      .select(col("event_type"), expr("us div 86400000000").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("dow", expr("(day + 4) % 7"))
    val base = daily.groupBy(col("event_type"), col("dow"))
      .agg(expr("sum(n) div count(1)").as("base_n"))
    daily.join(base, Seq("event_type", "dow"))
      .select(col("event_type"), col("day"), col("n"), col("base_n"),
        expr("abs(n - base_n) * 1000000L div base_n").as("dev_ppm"))
      .withColumn("anomalous", col("dev_ppm") >= AnomalyThrPpm)
  }

  // ---- q129: funnel conversion-latency percentiles ----
  // How long from first view to first purchase: exact p50/p90/p99 over
  // converting users, on a SECONDS axis — flooring to seconds bounds
  // the distinct-value frame by the corpus time range (the q74
  // cumulative-window precedent), where a microsecond axis would make
  // the percentile frame user-sized and the global window a 100 TB
  // sort. Negative latencies (purchase before any view) legitimately
  // rank below zero. One corpus aggregation keyed by user; everything
  // after runs on the distinct-seconds frame.
  private val LatPcts = Seq(50, 90, 99)
  def q129ConversionLatency(s: SparkSession, dir: String): DataFrame = {
    val firsts = ev(s, dir).filter(col("us").isNotNull)
      .filter(col("event_type").isin("view", "purchase"))
      .groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "view", col("us"))).as("v"),
        min(when(col("event_type") === "purchase", col("us"))).as("p"))
    // latencies can be negative; Spark `div` and DuckDB `//` both
    // truncate integer division toward zero, so the floors agree
    // (verified: -5 // 2 = -2 in DuckDB)
    val lat = firsts.filter(col("v").isNotNull && col("p").isNotNull)
      .select(expr("(p - v) div 1000000L").as("lat_s"))
    val c = lat.groupBy(col("lat_s")).agg(count(lit(1)).as("c"))
    val wCum = org.apache.spark.sql.expressions.Window.orderBy(col("lat_s"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wAll = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val cum = c.withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("tot", sum(col("c")).over(wAll))
    val outCols = coalesce(max(col("tot")), lit(0L)).as("n_users") +:
      LatPcts.map(p => min(when(
        col("cum") >= expr(s"($p * tot + 99) div 100"), col("lat_s")))
        .as(s"p${p}_s"))
    cum.agg(outCols.head, outCols.tail: _*)
  }

  // ---- q130: single change-point detection (best level shift) ----
  // Where did the series change: for every candidate split after day d
  // the floor-mean before vs after, the winner by (shift desc, day
  // asc). Cumulative sums make all |days| candidate splits ONE window
  // pass over the per-type daily aggregate — no per-split rescan, no
  // sequential recurrence — so the plan is two windows and a rank on
  // a days-sized frame, after the single corpus aggregation.
  def q130ChangePoint(s: SparkSession, dir: String): DataFrame =
    changePoint(ev(s, dir).filter(col("us").isNotNull)
      .select(col("event_type"), expr("us div 86400000000").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n")))

  /** The split scan over an already-aggregated `(event_type, day, n)`
    * frame — separated so the spec can plant a known level shift. */
  private[graft] def changePoint(daily: DataFrame): DataFrame = {
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wa = org.apache.spark.sql.expressions.Window.partitionBy(col("event_type"))
    val splits = daily
      .withColumn("cum_n", sum(col("n")).over(wc))
      .withColumn("cnt", count(lit(1)).over(wc))
      .withColumn("tot_n", sum(col("n")).over(wa))
      .withColumn("tot_cnt", count(lit(1)).over(wa))
      .filter(col("cnt") < col("tot_cnt"))
      .select(col("event_type"), col("day"),
        expr("cum_n div cnt").as("mean_before"),
        expr("(tot_n - cum_n) div (tot_cnt - cnt)").as("mean_after"),
        expr("""abs((tot_n - cum_n) div (tot_cnt - cnt) - cum_n div cnt)
          | * 1000000L div greatest(tot_n div tot_cnt, 1L)""".stripMargin)
          .as("shift_ppm"))
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
      .orderBy(col("shift_ppm").desc, col("day"))
    splits.withColumn("__rn", row_number().over(wr)).filter(col("__rn") === 1)
      .select(col("event_type"), col("day").as("split_day"),
        col("mean_before"), col("mean_after"), col("shift_ppm"))
  }

  private val RetentionDays = 30L
  private val UsPerDay = 86400000000L

  // ---- q189: retention / TTL audit ----
  // The governance card a data-retention policy is enforced against:
  // per event type, how much of the stream is already past the
  // retention horizon (anchor = the stream's own max event time, the
  // q150 anchor pattern — no wall clock, so the card replays
  // identically forever). The skinny (type, us) projection feeds the
  // anchor aggregate AND the per-type rollup (persisted — the
  // two-consumer rule); the anchor rides one broadcast scalar row.
  def q189RetentionAudit(s: SparkSession, dir: String): DataFrame = {
    val e = graft.llm.Caches.persistTracked(
      ev(s, dir).select(col("event_type"), col("us")))
    val anchor = e.agg(max(col("us")).as("__a"))
    e.crossJoin(broadcast(anchor))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("us") < col("__a") - lit(RetentionDays * UsPerDay), 1L)
          .otherwise(0L)).as("n_expired"),
        expr(s"cast((max(__a) - min(us)) div ${UsPerDay}L as bigint)")
          .as("oldest_age_days"))
      .withColumn("expired_ppm",
        expr("n_expired * 1000000L div greatest(n_events, 1L)"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q189_retention_audit" -> q189RetentionAudit _,
    "q110_transitions" -> q110Transitions _,
    "q129_conversion_latency" -> q129ConversionLatency _,
    "q130_change_point" -> q130ChangePoint _,
    "q115_retention"   -> q115Retention _,
    "q121_seasonality" -> q121Seasonality _,
    "q127_seasonal_anomaly" -> q127SeasonalAnomaly _,
    "q106_funnel"    -> q106Funnel _,
    "q34_asof_join"  -> q34AsofJoin _,
    "q144_attribution" -> q144Attribution _,
    "q150_decayed_engagement" -> q150DecayedEngagement _,
    "q35_range_join" -> q35RangeJoin _,
    "q90_gap_fill"   -> q90GapFill _,
    "q95_interval_coverage" -> q95IntervalCoverage _,
    "q102_burst"     -> q102Burst _,
  )

  val oracleSql: Map[String, String] = Map(
    // stream-anchored horizon + per-type expiry arithmetic
    "q189_retention_audit" ->
      s"""WITH e AS (SELECT event_type, epoch_ns(ts) // 1000 AS us FROM events),
         |a AS (SELECT max(us) AS a FROM e)
         |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
         |  CAST(sum(CASE WHEN us < a - ${RetentionDays * UsPerDay}
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_expired,
         |  CAST((a - min(us)) // $UsPerDay AS BIGINT) AS oldest_age_days,
         |  CAST(sum(CASE WHEN us < a - ${RetentionDays * UsPerDay}
         |    THEN 1 ELSE 0 END) * 1000000
         |    // greatest(count(*), 1) AS BIGINT) AS expired_ppm
         |FROM e, a GROUP BY event_type, a""".stripMargin,
    // plain inequality join + window with the identical tie rule
    // (max ts, then max event_id) — exact semantics, small-scale form
    "q34_asof_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |    epoch_ns(ts) // 1000 AS us FROM events),
        |p AS (SELECT event_id, user_id, us FROM e WHERE event_type = 'purchase'),
        |c AS (SELECT event_id, user_id, us FROM e WHERE event_type = 'click'),
        |j AS (SELECT p.event_id AS purchase_id, p.user_id,
        |    c.event_id AS click_id, p.us - c.us AS gap_us,
        |    row_number() OVER (PARTITION BY p.event_id
        |      ORDER BY c.us DESC, c.event_id DESC) AS rn
        |  FROM p LEFT JOIN c ON p.user_id = c.user_id AND c.us <= p.us)
        |SELECT purchase_id, user_id, click_id, gap_us FROM j WHERE rn = 1""".stripMargin,
    // the integer-shift step-exponential replayed bit-for-bit
    "q150_decayed_engagement" ->
      s"""WITH e AS (SELECT user_id,
         |    CAST(floor((epoch_ns(ts) // 1000) / 86400000000.0) AS BIGINT) AS day
         |  FROM events),
         |m AS (SELECT max(day) AS maxday FROM e)
         |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
         |  CAST(sum(1000000 >> CAST(least(
         |    ((SELECT maxday FROM m) - day) // $DecayHalfLifeDays, 19) AS INTEGER))
         |    AS BIGINT) AS decay_score
         |FROM e GROUP BY user_id""".stripMargin,
    // q34's inequality-join pick + the window filter and channel rollup
    "q144_attribution" ->
      s"""WITH e AS (SELECT event_id, user_id, event_type,
         |    epoch_ns(ts) // 1000 AS us, value FROM events),
         |p AS (SELECT event_id, user_id, us,
         |    CAST(floor(value * 10000.0) AS BIGINT) AS v_fp FROM e
         |  WHERE event_type = 'purchase'),
         |t AS (SELECT user_id, event_id, event_type, us FROM e
         |  WHERE event_type IN ('view', 'click', 'signup')),
         |m AS (SELECT p.event_id, p.us AS p_us, p.v_fp,
         |    t.event_type AS t_type, t.us AS t_us,
         |    row_number() OVER (PARTITION BY p.event_id
         |      ORDER BY t.us DESC, t.event_id DESC) AS rn
         |  FROM p LEFT JOIN t ON p.user_id = t.user_id AND t.us <= p.us),
         |c AS (SELECT v_fp,
         |    CASE WHEN t_us IS NOT NULL AND p_us - t_us <= $AttrWindowUs
         |      THEN t_type ELSE 'direct' END AS channel
         |  FROM m WHERE rn = 1)
         |SELECT channel, count(*) AS n_purchases,
         |  CAST(sum(v_fp) AS BIGINT) AS attributed_fp
         |FROM c GROUP BY channel""".stripMargin,
    "q35_range_join" ->
      s"""WITH e AS (SELECT event_id, user_id, event_type,
         |    epoch_ns(ts) // 1000 AS us FROM events),
         |l AS (SELECT event_id, user_id, us FROM e WHERE event_type = 'error')
         |SELECT l.event_id, l.user_id, count(r.us) AS n_in_window
         |FROM l LEFT JOIN e r ON r.user_id = l.user_id
         |  AND r.us >= l.us - $WindowUs AND r.us < l.us
         |GROUP BY l.event_id, l.user_id""".stripMargin,
    "q90_gap_fill" ->
      """WITH h AS (SELECT event_type,
        |    CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_ts,
        |    CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
        |mm AS (SELECT min(hour_ts) AS mn, max(hour_ts) AS mx FROM h),
        |axis AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hour_ts
        |  FROM mm),
        |ty AS (SELECT DISTINCT event_type FROM events),
        |g AS (SELECT ty.event_type, axis.hour_ts FROM ty, axis)
        |SELECT g.event_type, g.hour_ts, coalesce(h.n, 0) AS n_events,
        |  h.n IS NULL AS is_gap
        |FROM g LEFT JOIN h ON g.event_type = h.event_type
        |  AND g.hour_ts = h.hour_ts""".stripMargin,
    // identical gaps-and-islands walk + half-open ±1 sweep (close
    // before open at equal stamps), all-integer microseconds
    "q95_interval_coverage" ->
      """WITH b AS (SELECT user_id AS k, event_id AS iid,
        |    epoch_ns(ts) // 1000 AS s,
        |    epoch_ns(ts) // 1000 + (event_id % 7 + 1) * 60000000 AS e
        |  FROM events WHERE ts IS NOT NULL),
        |i AS (SELECT k, iid, s, e, max(e) OVER (PARTITION BY k ORDER BY s, e, iid
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe FROM b),
        |j AS (SELECT k, iid, s, e,
        |    CASE WHEN pe IS NULL OR s > pe THEN 1 ELSE 0 END AS ni FROM i),
        |l AS (SELECT k, s, e, sum(ni) OVER (PARTITION BY k ORDER BY s, e, iid
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl FROM j),
        |g AS (SELECT k, isl, count(*) AS n, min(s) AS i_s, max(e) AS i_e
        |  FROM l GROUP BY k, isl),
        |pk AS (SELECT k, CAST(sum(n) AS BIGINT) AS n_intervals,
        |    CAST(count(*) AS BIGINT) AS n_islands,
        |    CAST(sum(i_e - i_s) AS BIGINT) AS covered_us FROM g GROUP BY k),
        |ev2 AS (SELECT k, s AS ts, 1 AS d FROM b
        |  UNION ALL SELECT k, e, -1 FROM b),
        |c AS (SELECT k, sum(d) OVER (PARTITION BY k ORDER BY ts, d
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c FROM ev2),
        |mc AS (SELECT k, CAST(max(c) AS BIGINT) AS max_conc FROM c GROUP BY k)
        |SELECT pk.k AS user_id, n_intervals, n_islands, covered_us, mc.max_conc
        |FROM pk JOIN mc ON pk.k = mc.k""".stripMargin,
    "q102_burst" ->
      s"""WITH e AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us
         |  FROM events),
         |c AS (SELECT l.event_id, l.user_id, count(r.us) AS n
         |  FROM e l LEFT JOIN e r ON r.user_id = l.user_id
         |    AND r.us >= l.us - $BurstWindowUs AND r.us < l.us
         |  GROUP BY 1, 2)
         |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
         |  CAST(max(n) + 1 AS BIGINT) AS max_burst
         |FROM c GROUP BY user_id""".stripMargin,
    // same cumulative-split arithmetic, same (shift desc, day) winner
    "q130_change_point" ->
      """WITH d AS (SELECT event_type, epoch_ns(ts) // 1000 // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
        |c AS (SELECT event_type, day, n,
        |    sum(n) OVER w AS cum_n, count(*) OVER w AS cnt,
        |    sum(n) OVER p AS tot_n, count(*) OVER p AS tot_cnt
        |  FROM d
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day
        |    ROWS UNBOUNDED PRECEDING),
        |  p AS (PARTITION BY event_type)),
        |s AS (SELECT event_type, day,
        |    cum_n // cnt AS mean_before,
        |    (tot_n - cum_n) // (tot_cnt - cnt) AS mean_after,
        |    abs((tot_n - cum_n) // (tot_cnt - cnt) - cum_n // cnt)
        |      * 1000000 // greatest(tot_n // tot_cnt, 1) AS shift_ppm
        |  FROM c WHERE cnt < tot_cnt),
        |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY shift_ppm DESC, day) AS rn FROM s)
        |SELECT event_type, CAST(day AS BIGINT) AS split_day,
        |  CAST(mean_before AS BIGINT) AS mean_before,
        |  CAST(mean_after AS BIGINT) AS mean_after,
        |  CAST(shift_ppm AS BIGINT) AS shift_ppm
        |FROM r WHERE rn = 1""".stripMargin,
    // same first-view/first-purchase mins, seconds floor, ceil-rank picks
    "q129_conversion_latency" ->
      s"""WITH e AS (SELECT user_id, event_type, epoch_ns(ts) // 1000 AS us
         |  FROM events WHERE ts IS NOT NULL
         |    AND event_type IN ('view', 'purchase')),
         |f AS (SELECT user_id,
         |    min(CASE WHEN event_type = 'view' THEN us END) AS v,
         |    min(CASE WHEN event_type = 'purchase' THEN us END) AS p
         |  FROM e GROUP BY user_id),
         |l AS (SELECT (p - v) // 1000000 AS lat_s FROM f
         |  WHERE v IS NOT NULL AND p IS NOT NULL),
         |c AS (SELECT lat_s, CAST(count(*) AS BIGINT) AS c FROM l GROUP BY lat_s),
         |cum AS (SELECT lat_s, sum(c) OVER (ORDER BY lat_s) AS cum,
         |    sum(c) OVER () AS tot FROM c)
         |SELECT coalesce(CAST(max(tot) AS BIGINT), 0) AS n_users,
         |  ${LatPcts.map(p =>
              s"CAST(min(CASE WHEN cum >= ($p * tot + 99) // 100 THEN lat_s END) AS BIGINT) AS p${p}_s")
              .mkString(",\n|  ")}
         |FROM cum""".stripMargin,
    // same daily aggregation, floor-mean baseline, ppm deviation
    "q127_seasonal_anomaly" ->
      s"""WITH d AS (SELECT event_type, epoch_ns(ts) // 1000 // 86400000000 AS day,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
         |d2 AS (SELECT *, (day + 4) % 7 AS dow FROM d),
         |b AS (SELECT event_type, dow, sum(n) // count(*) AS base_n
         |  FROM d2 GROUP BY 1, 2)
         |SELECT d2.event_type, CAST(d2.day AS BIGINT) AS day, d2.n,
         |  CAST(b.base_n AS BIGINT) AS base_n,
         |  CAST(abs(d2.n - b.base_n) * 1000000 // b.base_n AS BIGINT) AS dev_ppm,
         |  abs(d2.n - b.base_n) * 1000000 // b.base_n >= $AnomalyThrPpm AS anomalous
         |FROM d2 JOIN b USING (event_type, dow)""".stripMargin,
    // same epoch-day weekday arithmetic, same cent floor, ppm div
    "q121_seasonality" ->
      """WITH e AS (SELECT event_type,
        |    (epoch_ns(ts) // 1000 // 86400000000 + 4) % 7 AS dow,
        |    CAST(floor(value * 100) AS BIGINT) AS vc
        |  FROM events WHERE ts IS NOT NULL),
        |c AS (SELECT event_type, CAST(dow AS BIGINT) AS dow,
        |    CAST(count(*) AS BIGINT) AS n, CAST(sum(vc) AS BIGINT) AS value_cents
        |  FROM e GROUP BY 1, 2)
        |SELECT event_type, dow, n, value_cents,
        |  CAST(n * 1000000 // sum(n) OVER (PARTITION BY event_type) AS BIGINT)
        |    AS share_ppm
        |FROM c""".stripMargin,
    // same integer epoch-day floor, distinct (user, day) spine
    "q115_retention" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 // 86400000000 AS day
        |  FROM events WHERE ts IS NOT NULL),
        |d AS (SELECT DISTINCT user_id, day FROM e),
        |c AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY user_id)
        |SELECT c.cohort_day, d.day - c.cohort_day AS day_offset,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM d JOIN c USING (user_id) GROUP BY 1, 2""".stripMargin,
    // same lag walk, same (us, event_id) tie order, ppm floor division
    "q110_transitions" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |    epoch_ns(ts) // 1000 AS us FROM events WHERE ts IS NOT NULL),
        |p AS (SELECT event_type AS from_et,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id)
        |      AS to_et FROM e),
        |c AS (SELECT from_et, to_et, CAST(count(*) AS BIGINT) AS n FROM p
        |  WHERE to_et IS NOT NULL GROUP BY 1, 2)
        |SELECT from_et, to_et, n,
        |  CAST((n * 1000000) // sum(n) OVER (PARTITION BY from_et) AS BIGINT)
        |    AS share_ppm
        |FROM c""".stripMargin,
    // each stage's first reach strictly after the previous frontier
    "q106_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ns(ts) // 1000 AS us
        |  FROM events),
        |u AS (SELECT DISTINCT user_id FROM e),
        |s1 AS (SELECT user_id, min(us) AS view_us FROM e
        |  WHERE event_type = 'view' AND us IS NOT NULL GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.us) AS click_us FROM e
        |  JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.us > s1.view_us GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.us) AS purchase_us FROM e
        |  JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.us > s2.click_us GROUP BY e.user_id)
        |SELECT u.user_id, s1.view_us, s2.click_us, s3.purchase_us,
        |  CAST((CASE WHEN s1.view_us IS NULL THEN 0 ELSE 1 END)
        |    + (CASE WHEN s2.click_us IS NULL THEN 0 ELSE 1 END)
        |    + (CASE WHEN s3.purchase_us IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS stage
        |FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
        |  LEFT JOIN s3 USING (user_id)""".stripMargin,
  )
}
