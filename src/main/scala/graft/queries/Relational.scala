package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational query suite over the TPC-H-ish testdata.
  *
  * The reference (`kartverket/dask-felleskomponenter`) delegates every
  * relational operation to Spark (SURVEY.md §2.2): scans, select /
  * withColumn / filter-isin projections, one 4-key left equi-join
  * (`governance/main.py:51-62`), and count() actions. This suite
  * exercises that surface — plus the join / aggregate / window / set-op
  * machinery any engine user needs — as declarative DataFrame plans so
  * Catalyst handles pushdown, pruning and join strategy selection.
  *
  * Determinism contract with the DuckDB oracle: every float aggregation
  * goes through `floor(x * 10^k)` → BIGINT "fixed-point" before SUM.
  * IEEE-754 multiplication and floor are bit-deterministic across
  * engines, and BIGINT sums are associative, so the hash compare is
  * exact regardless of partitioning / evaluation order. Plain SUM over
  * doubles would differ in the last ulp between Spark and DuckDB.
  */
object Relational {

  /** floor(col * 10^scale) as BIGINT — engine-portable fixed-point. */
  private def cents(c: Column, scale: Int = 2): Column =
    floor(c * math.pow(10, scale)).cast("bigint")

  /** Overflow-safe fixed-point sum: accumulate in DECIMAL(38,0) —
    * BIGINT sums wrap silently in non-ANSI mode at ~9.2e18, which 100 TB
    * row counts can reach, while DuckDB promotes to HUGEINT. Final cast
    * back to BIGINT matches the oracle's `CAST(sum(...) AS BIGINT)`. */
  private def sumFp(c: Column): Column =
    sum(c.cast("decimal(38,0)")).cast("bigint")

  private def ts(lit0: String): Column = to_timestamp(lit(lit0))

  // ---- q1: pricing summary (scan → filter → groupBy agg → sort) ----
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame =
    graft.Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= ts("1998-09-02 00:00:00"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sumFp(cents(col("l_extendedprice"))).as("sum_base_cents"),
        sumFp(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)).as("sum_disc_fp"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  // ---- q2: top-10 revenue orders (shuffle agg → join → topk) ----
  def q2TopOrders(s: SparkSession, dir: String): DataFrame = {
    val rev = graft.Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(sumFp(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)).as("revenue_fp"))
    graft.Tables.orders(s, dir)
      .join(rev, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"), col("o_orderpriority"), col("revenue_fp"))
      .orderBy(col("revenue_fp").desc, col("o_orderkey"))
      .limit(10)
  }

  // ---- q3: revenue per nation/region (broadcast dim joins) ----
  def q3NationRevenue(s: SparkSession, dir: String): DataFrame =
    graft.Tables.orders(s, dir)
      .join(graft.Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(graft.Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(graft.Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"), col("r_name"))
      .agg(
        sumFp(cents(col("o_totalprice"))).as("total_cents"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("n_name"))

  // ---- q4: order priority with EXISTS (left-semi join) ----
  def q4PrioritySemi(s: SparkSession, dir: String): DataFrame = {
    val big = graft.Tables.lineitem(s, dir)
      .filter(col("l_quantity") > 45).select(col("l_orderkey"))
    graft.Tables.orders(s, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  // ---- q5: top-3 orders per customer (window row_number) ----
  def q5WindowTopk(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    graft.Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      // no trailing global sort: output order is presentational only and
      // the driver's comparator sorts rows — the range-partition
      // exchange would be pure waste at scale
  }

  // ---- q6: selective filtered aggregate (predicate pushdown path) ----
  def q6FilteredRevenue(s: SparkSession, dir: String): DataFrame =
    graft.Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
        col("l_shipdate") < ts("1997-01-01 00:00:00") &&
        col("l_discount") >= 0.03 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(sumFp(cents(col("l_extendedprice") * col("l_discount"), 4)).as("revenue_fp"),
        count(lit(1)).as("n_rows"))

  // ---- q7: exact distinct counts per group ----
  def q7DistinctCounts(s: SparkSession, dir: String): DataFrame =
    graft.Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  // ---- q8: set difference — customers with no orders in 2001 ----
  def q8CustomersNoOrders(s: SparkSession, dir: String): DataFrame =
    graft.Tables.customer(s, dir).select(col("c_custkey"))
      .except(graft.Tables.orders(s, dir)
        .filter(col("o_orderdate") >= ts("2001-01-01 00:00:00"))
        .select(col("o_custkey").as("c_custkey")))

  // ---- q9: events per type per hour (time bucketing) ----
  def q9EventsHourly(s: SparkSession, dir: String): DataFrame =
    graft.Tables.events(s, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour_ts"))
      .agg(
        count(lit(1)).as("n_events"),
        sumFp(cents(col("value"), 4)).as("sum_value_fp"))

  // ---- q10: per-brand part stats (min/max/avg) ----
  def q10BrandStats(s: SparkSession, dir: String): DataFrame =
    graft.Tables.part(s, dir)
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("n_parts"),
        min(col("p_retailprice")).as("min_price"),
        max(col("p_retailprice")).as("max_price"),
        (sum(cents(col("p_retailprice")).cast("decimal(38,0)")).cast("double") / lit(100.0) /
          count(lit(1)).cast("double")).as("avg_price"))
      .orderBy(col("p_brand"))

  // ---- q11: sessionization (lag window + conditional aggregation) ----
  def q11Sessions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    graft.Tables.events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 30L * 60 * 1000000,
          lit(1L)).otherwise(lit(0L)))
      .groupBy(col("user_id"))
      .agg(sum(col("new_sess")).as("n_sessions"), count(lit(1)).as("n_events"))
  }

  // ---- q148: top session paths (behavioral path mining) ----
  // The path-mining complement to the funnel (q106) and the transition
  // matrix (q110): the most common session-opening event sequences.
  // Sessions cut by q11's 30-minute gap rule on the (ts, event_id)
  // order; each session's first 5 event types join into a path string;
  // top-15 by (count desc, path asc). All windows partition by user
  // (or user+session) — never a global sort; the final rank runs on
  // the path-distinct aggregate via TakeOrdered.
  private val PathLen = 5
  private val PathTopK = 15
  def q148SessionPaths(s: SparkSession, dir: String): DataFrame = {
    val wU = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val e = graft.Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("prev_us", lag(col("us"), 1).over(wU))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          col("us") - col("prev_us") > 30L * 60 * 1000000, lit(1L))
          .otherwise(lit(0L)))
      .withColumn("sess_no", sum(col("new_sess")).over(wU))
    val wS = Window.partitionBy(col("user_id"), col("sess_no"))
      .orderBy(col("us"), col("event_id"))
    val paths = e.withColumn("rn", row_number().over(wS))
      .filter(col("rn") <= PathLen)
      .groupBy(col("user_id"), col("sess_no"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("rn"), col("event_type")))),
          x => x.getField("event_type")), ">").as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
    paths.orderBy(col("n_sessions").desc, col("path").asc).limit(PathTopK)
      .withColumn("rn", row_number().over(
        Window.orderBy(col("n_sessions").desc, col("path").asc)).cast("bigint"))
  }

  // ---- q149: referential-integrity audit (FK orphan card) ----
  // The data-quality gate a warehouse runs before trusting joins:
  // per declared FK edge, total child rows, orphan rows (no parent),
  // and distinct orphan keys. Each edge is one LEFT ANTI join — the
  // shape Catalyst turns into a broadcast/hash anti join with the
  // child scan pruned to the key column — so the card costs one
  // key-projection pass per edge at any scale.
  def q149FkAudit(s: SparkSession, dir: String): DataFrame = {
    def edge(name: String, child: DataFrame, childKey: String,
        parent: DataFrame, parentKey: String): DataFrame = {
      val orphans = child.select(col(childKey).as("k"))
        .join(parent.select(col(parentKey).as("k")), Seq("k"), "left_anti")
      val t = child.agg(count(lit(1)).as("n_child")).select(col("n_child"))
      val o = orphans.agg(count(lit(1)).as("n_orphans"),
        countDistinct(col("k")).as("n_orphan_keys"))
      t.crossJoin(o).select(lit(name).as("fk"), col("n_child"),
        col("n_orphans"), col("n_orphan_keys"))
    }
    val li = graft.Tables.lineitem(s, dir)
    val o = graft.Tables.orders(s, dir)
    val c = graft.Tables.customer(s, dir)
    val su = graft.Tables.supplier(s, dir)
    val n = graft.Tables.nation(s, dir)
    edge("lineitem->orders", li, "l_orderkey", o, "o_orderkey")
      .unionByName(edge("lineitem->supplier", li, "l_suppkey", su, "s_suppkey"))
      .unionByName(edge("orders->customer", o, "o_custkey", c, "c_custkey"))
      .unionByName(edge("customer->nation", c, "c_nationkey", n, "n_nationkey"))
      .unionByName(edge("supplier->nation", su, "s_nationkey", n, "n_nationkey"))
  }

  // ---- q156: schema-dynamic column profile of `orders` ----
  // The pre-trust audit card ([[graft.governance.Profile]]): per
  // column, null mass, exact distinct cardinality, and the value
  // range rendered engine-portably (floats through the fixed-point
  // contract, timestamps to the second). One scan + one Expand
  // aggregate regardless of column count.
  def q156ColumnProfile(s: SparkSession, dir: String): DataFrame =
    graft.governance.Profile.columnProfile(graft.Tables.orders(s, dir))

  // ---- q165: Benford leading-digit audit of order amounts ----
  // The first-pass anomaly screen an audit runs over any financial
  // column: the distribution of leading digits of o_totalprice vs
  // Benford's law, per digit, in exact ppm. The leading digit comes
  // from the INTEGER cents value via decimal-string head — integer→
  // string is exact in every engine, where float log10 at a power-of-
  // ten boundary is not. Expected shares are the floor(log10(1+1/d)
  // ·10⁶) constants inlined below; deviation_ppm = |observed −
  // expected| per digit (a synthetic TPC-H price column is NOT
  // Benford — the card's job is to SHOW that, deterministically).
  // One scan, a 9-group aggregate, a broadcast scalar total.
  private val BenfordPpm = Map(1 -> 301029L, 2 -> 176091L, 3 -> 124938L,
    4 -> 96910L, 5 -> 79181L, 6 -> 66946L, 7 -> 57991L, 8 -> 51152L,
    9 -> 45757L)
  def q165Benford(s: SparkSession, dir: String): DataFrame = {
    val expected = BenfordPpm.toSeq.sortBy(_._1)
      .map { case (d, p) => when(col("digit") === d.toLong, p) }
      .reduceRight(_ otherwise _)
    // persisted (Caches-tracked): the 9-row digit histogram feeds the
    // output and the scalar total — one orders scan, not two
    val byDigit = graft.llm.Caches.persistTracked(
      graft.Tables.orders(s, dir)
        .select(cents(col("o_totalprice")).as("c"))
        .filter(col("c") > 0L)
        .select(substring(col("c").cast("string"), 1, 1).cast("bigint").as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n")))
    val tot = byDigit.agg(sum(col("n")).cast("bigint").as("t"))
    byDigit.crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        expr("cast((n * 1000000L) div t as bigint)").as("observed_ppm"),
        expected.cast("bigint").as("benford_ppm"))
      .withColumn("deviation_ppm", abs(col("observed_ppm") - col("benford_ppm")))
      .orderBy(col("digit"))
  }

  // ---- q162: k-anonymity audit over customer quasi-identifiers ----
  // The re-identification risk card a dataset release owes its DPO:
  // equivalence classes over the quasi-identifier tuple (nation,
  // market segment, account-balance band), then per segment the
  // class count, the smallest class (the dataset's k), and how many
  // classes/rows sit below the k=5 bar. Scale shape: one grouped
  // count over the quasi-identifier tuple (map-side combined), then
  // an aggregation over class-cardinality rows — never row-scale
  // state. The balance band is floor(bal/1000) — one IEEE divide +
  // floor both engines compute identically.
  private val AnonK = 5L
  def q162KAnonymity(s: SparkSession, dir: String): DataFrame =
    graft.Tables.customer(s, dir)
      .select(col("c_mktsegment"), col("c_nationkey"),
        floor(col("c_acctbal") / 1000.0).cast("bigint").as("bal_band"))
      .groupBy(col("c_mktsegment"), col("c_nationkey"), col("bal_band"))
      .agg(count(lit(1)).as("cls_n"))
      .groupBy(col("c_mktsegment"))
      .agg(sum(col("cls_n")).cast("bigint").as("n_rows"),
        count(lit(1)).as("n_classes"),
        min(col("cls_n")).as("k_min"),
        sum(when(col("cls_n") < AnonK, 1L).otherwise(0L)).as("n_risky_classes"),
        sum(when(col("cls_n") < AnonK, col("cls_n")).otherwise(0L))
          .cast("bigint").as("n_risky_rows"))
      .orderBy(col("c_mktsegment"))

  // ---- q249: l-diversity audit (attribute disclosure risk) ----
  // k-anonymity (q162) bounds RE-IDENTIFICATION; it says nothing
  // about ATTRIBUTE disclosure — a class of 50 rows that all share
  // one sensitive value still leaks it to anyone who can place a
  // person in the class. The l-diversity audit over the released
  // (quasi-identifier, sensitive) view: the SAME equivalence classes
  // as q162 (nation, market segment, balance band — one spelling,
  // the two audits grade the same release), sensitive value = the
  // order priority of the customer's orders. Per segment: classes,
  // the worst class's distinct-sensitive-count (the dataset's l),
  // and the homogeneous classes (l = 1) with their row exposure.
  // Scale: the released view is one fact join; then a two-level
  // grouped count — class-cardinality state only, never row state.
  def q249LDiversity(s: SparkSession, dir: String): DataFrame =
    graft.Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey"),
        floor(col("c_acctbal") / 1000.0).cast("bigint").as("bal_band"))
      .join(graft.Tables.orders(s, dir)
          .select(col("o_custkey"), col("o_orderpriority")),
        col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_mktsegment"), col("c_nationkey"), col("bal_band"))
      .agg(count(lit(1)).as("cls_rows"),
        countDistinct(col("o_orderpriority")).as("l"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_classes"),
        sum(col("cls_rows")).cast("bigint").as("n_rows"),
        min(col("l")).as("l_min"),
        sum(when(col("l") === 1L, 1L).otherwise(0L)).as("n_homogeneous"),
        sum(when(col("l") === 1L, col("cls_rows")).otherwise(0L))
          .cast("bigint").as("n_exposed_rows"))

  // ---- q159: shuffle-skew advisor card ----
  // The diagnostic that decides BEFORE a 100 TB join whether to salt
  // (q133's machinery), broadcast, or trust AQE skew splitting: for
  // each candidate shuffle key, total rows, distinct keys, the
  // heaviest key's row count, its corpus share in ppm, and the salt
  // factor that would level the hottest key down to the mean
  // (ceil(max/mean), integer arithmetic). Cost per key: one
  // partial-aggregated groupBy(count) + one tiny aggregate over
  // key-cardinality rows — the same pass a shuffle would pay anyway,
  // run once at profiling time instead of discovered as a straggler
  // at job time.
  def q159SkewAdvisor(s: SparkSession, dir: String): DataFrame = {
    def card(name: String, df: DataFrame, key: String): DataFrame =
      df.groupBy(col(key).as("k")).agg(count(lit(1)).as("c"))
        .agg(sum(col("c")).cast("bigint").as("n_rows"),
          count(lit(1)).as("n_keys"),
          max(col("c")).as("max_per_key"))
        .select(lit(name).as("key_col"), col("n_rows"), col("n_keys"),
          col("max_per_key"),
          expr("cast((1000000 * max_per_key) div n_rows as bigint)")
            .as("top_share_ppm"),
          expr("cast((max_per_key * n_keys + n_rows - 1) div n_rows as bigint)")
            .as("salt_factor"))
    card("lineitem.l_orderkey", graft.Tables.lineitem(s, dir), "l_orderkey")
      .unionByName(card("lineitem.l_suppkey",
        graft.Tables.lineitem(s, dir), "l_suppkey"))
      .unionByName(card("orders.o_custkey",
        graft.Tables.orders(s, dir), "o_custkey"))
      .unionByName(card("events.user_id",
        graft.Tables.events(s, dir), "user_id"))
  }

  // ---- q305: join-size pre-flight (output-cardinality card) ----
  // The other half of q159's planner diagnostic: q159 grades ONE
  // table's key skew; this predicts a JOIN's output size before
  // paying for it. For an inner equi-join the prediction is an
  // identity, not an estimate — |A ⋈ B| = Σ_k cA(k)·cB(k) — so the
  // card is exact, and it costs two count frames joined on the key
  // (each the map-side-combined aggregate a shuffle would compute
  // anyway) instead of materializing the join. Two candidates a
  // 100 TB planner actually fears: the fact⋈fact orderkey join
  // (benign — orders are keys) and the lineitem SELF-join on partkey
  // (the quadratic-blowup shape: Σ c(k)²). Per candidate: input
  // sizes, shared keys, the exact predicted output, the blowup ratio
  // vs the larger input (floor ppm), and the single heaviest key's
  // contribution — the row that tells an engineer "salt this key"
  // (q133) or "don't run this". The oracle replays both count-frame
  // products in HUGEINT.
  def q305JoinPreflight(s: SparkSession, dir: String): DataFrame = {
    def counts(df: DataFrame, key: String): DataFrame =
      df.groupBy(col(key).as("k")).agg(count(lit(1)).as("c"))
    def card(name: String, a: DataFrame, b: DataFrame): DataFrame = {
      val prod = counts(a, a.columns.head).withColumnRenamed("c", "ca")
        .join(counts(b, b.columns.head).withColumnRenamed("c", "cb"), Seq("k"))
        .select(col("k"),
          (col("ca").cast("decimal(38,0)") * col("cb")).as("p"))
      val na = a.agg(count(lit(1)).as("n")).select(col("n"))
      val nb = b.agg(count(lit(1)).as("n")).select(col("n"))
      prod.agg(
          count(lit(1)).cast("bigint").as("n_shared_keys"),
          coalesce(sum(col("p")), lit(0L).cast("decimal(38,0)"))
            .as("__pred"),
          coalesce(max(col("p")), lit(0L).cast("decimal(38,0)"))
            .as("__top"))
        .crossJoin(na.select(col("n").as("n_left")))
        .crossJoin(nb.select(col("n").as("n_right")))
        .select(lit(name).as("join_name"),
          col("n_left"), col("n_right"), col("n_shared_keys"),
          col("__pred").cast("bigint").as("predicted_rows"),
          expr("cast(__pred * 1000000 div greatest(n_left, n_right) " +
            "as bigint)").as("blowup_ppm"),
          col("__top").cast("bigint").as("top_key_rows"),
          expr("cast(case when __pred > 0 then __top * 1000000 div __pred " +
            "else 0 end as bigint)").as("top_key_share_ppm"))
    }
    val li = graft.Tables.lineitem(s, dir)
    val lok = li.select(col("l_orderkey"))
    val lpk = li.select(col("l_partkey"))
    card("lineitem_orders_on_orderkey", lok,
        graft.Tables.orders(s, dir).select(col("o_orderkey")))
      .unionByName(card("lineitem_self_on_partkey", lpk, lpk))
      .orderBy(col("join_name"))
  }

  // ---- q12: rollup over year × priority (grouping sets) ----
  def q12YearPriorityRollup(s: SparkSession, dir: String): DataFrame =
    graft.Tables.orders(s, dir)
      .withColumn("o_year", year(col("o_orderdate")).cast("bigint"))
      .rollup(col("o_year"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sumFp(cents(col("o_totalprice"))).as("total_cents"))
      .orderBy(col("o_year").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  // ---- q109: hourly × event-type pivot (wide activity matrix) ----
  // The dashboard shape every event pipeline exports: one row per
  // hour, one counted column per event type. Explicit pivot values
  // keep the schema static (no values-discovery job, no
  // nondeterministic column order at 100 TB); Catalyst plans it as a
  // single aggregate with conditional counts — one shuffle, no join.
  private val PivotTypes = Seq("view", "click", "purchase", "signup", "error")
  def q109EventPivot(s: SparkSession, dir: String): DataFrame =
    graft.Tables.events(s, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour_ts"))
      .pivot("event_type", PivotTypes)
      .agg(count(lit(1)))
      .select(col("hour_ts") +:
        PivotTypes.map(t => coalesce(col(t), lit(0L)).as(s"n_$t")): _*)

  // ---- q114: trailing 90-day spend (RANGE-frame window) ----
  // The running-exposure shape (rolling spend, rate limits, trailing
  // quotas): per order, the customer's order count and cent-exact
  // spend over the preceding 90 days INCLUDING same-day peers — a
  // RANGE frame over an integer day axis, which row_number/lag
  // machinery cannot express. Partitioned by customer: no global
  // sort, frames never cross the key shuffle, and the DECIMAL(38,0)
  // accumulator keeps 100 TB sums from wrapping.
  private val RollingDays = 90
  def q114RollingSpend(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("order_day"))
      .rangeBetween(-RollingDays, Window.currentRow)
    graft.Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        datediff(col("o_orderdate"), to_date(lit("1970-01-01")))
          .cast("bigint").as("order_day"),
        cents(col("o_totalprice")).as("__cents"))
      .select(col("o_orderkey"), col("o_custkey"), col("order_day"),
        count(lit(1)).over(w).as("n_90d"),
        sum(col("__cents").cast("decimal(38,0)")).over(w)
          .cast("bigint").as("spend_90d_cents"))
  }

  // ---- q145: group-wise winsorization (robust metric aggregates) ----
  // Mean-of-metric dashboards die on outliers; the robust fix clips
  // each event_type's values at its own exact p05/p95 before summing.
  // Cutoffs use the q40 order-statistic contract (smallest value whose
  // cumulative count reaches ceil(q·n)) over the (type, value)
  // counting aggregate — bounded by distinct values per type, never a
  // corpus sort — then one broadcast-size cutoff join clips and
  // re-aggregates in fixed-point. Clip counts ride along as the
  // evidence a metrics reviewer asks for first.
  def q145Winsorize(s: SparkSession, dir: String): DataFrame = {
    val v = graft.Tables.events(s, dir)
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        expr("cast(floor(value * 10000.0) as bigint)").as("v_fp"))
    val cuts = graft.llm.Robust
      .cutoffsFp(v, col("event_type"), col("v_fp"), loQ = 0.05, hiQ = 0.95)
      .withColumnRenamed("group_key", "event_type")
    v.join(broadcast(cuts), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        min(col("lo_fp")).as("lo_fp"), min(col("hi_fp")).as("hi_fp"),
        sum(when(col("v_fp") < col("lo_fp"), 1L).otherwise(0L)).as("n_clip_low"),
        sum(when(col("v_fp") > col("hi_fp"), 1L).otherwise(0L)).as("n_clip_high"),
        sum(greatest(least(col("v_fp"), col("hi_fp")), col("lo_fp")))
          .as("winsorized_sum_fp"))
  }

  // ---- q118: Pareto skyline (size maximal, price minimal) ----
  // Multi-criteria filtering without a scoring function: keep parts no
  // other part beats on BOTH size (bigger better) and price (cheaper
  // better), strict in at least one. The naive operator is an O(n²)
  // anti-join; this plan exploits the 2-D structure: the frontier is
  // fully determined by min-price-per-size (a partial aggregate, the
  // ONLY corpus-sized shuffle, bounded by the size domain) plus a
  // running min over sizes descending — a window over the TINY
  // per-size frame — broadcast back for the final scan-local filter.
  // 100×: the per-size frame stays |size-domain|-sized; nothing else
  // grows beyond one map-side combine.
  def q118Skyline(s: SparkSession, dir: String): DataFrame = {
    val pts = graft.Tables.part(s, dir)
      .select(col("p_partkey"), col("p_size").cast("bigint").as("size"),
        cents(col("p_retailprice")).as("price_cents"))
    val bySize = pts.groupBy(col("size"))
      .agg(min(col("price_cents")).as("best"))
    val w = Window.orderBy(col("size").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val thr = bySize.select(col("size"), col("best"),
      min(col("best")).over(w).as("beyond"))
    pts.join(broadcast(thr), "size")
      .filter(col("price_cents") === col("best") &&
        (col("beyond").isNull || col("beyond") > col("price_cents")))
      .select(col("p_partkey"), col("size"), col("price_cents"))
  }

  // ---- q119: CUBE over year × priority with grouping_id ----
  // q12's rollup sibling completing the grouping-sets surface: all
  // four (year, priority) marginal combinations in one pass, each row
  // tagged by grouping_id so a consumer can tell "year total" from
  // "priority total" without null-sniffing. One shuffle; Catalyst
  // expands the cube into a single aggregate.
  def q119CubeGrouping(s: SparkSession, dir: String): DataFrame =
    graft.Tables.orders(s, dir)
      .withColumn("o_year", year(col("o_orderdate")).cast("bigint"))
      .cube(col("o_year"), col("o_orderpriority"))
      .agg(grouping_id().cast("bigint").as("gid"), count(lit(1)).as("n_orders"),
        sumFp(cents(col("o_totalprice"))).as("total_cents"))

  // ---- q120: z-order layout audit ----
  // The data-layout decision for multi-predicate scans at 100 TB:
  // interleave (custkey mod 2^8, order-day mod 2^8) into a Morton key
  // and show, per curve bucket, how tightly BOTH source dimensions are
  // enveloped — the min/max spans ARE the zone-map bounds a writer
  // clustering files by this key would give every file, i.e. the
  // pruning a scan gets on either predicate. The key is scan-local
  // integer arithmetic (graft.layout.ZOrder, one shared term
  // generator for both engines); the audit is one aggregation.
  private val ZBits = 8
  private val ZMask = 1L << ZBits
  private val ZBucketSize = 1024L
  def q120ZorderAudit(s: SparkSession, dir: String): DataFrame = {
    val zSql = graft.layout.ZOrder.zExprSql("x", "y", ZBits, "div")
    graft.Tables.orders(s, dir)
      .select((col("o_custkey") % ZMask).as("x"),
        (datediff(col("o_orderdate"), to_date(lit("1970-01-01"))) % ZMask)
          .cast("bigint").as("y"))
      .select(col("x"), col("y"), expr(zSql).as("z"))
      .groupBy(expr(s"z div $ZBucketSize").as("zbucket"))
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"))
  }

  // ---- q132: unpivot (melt) — the reshape inverse of q109 ----
  // Wide → tall via stack(): q109's hourly matrix melted back to
  // (hour_ts, event_type, n), absent cells as explicit zeros. stack is
  // a row-local generator (no shuffle beyond q109's aggregate), and
  // building on q109 verbatim means the pair certifies the round trip.
  def q132Unpivot(s: SparkSession, dir: String): DataFrame = {
    val stackArgs = PivotTypes.map(t => s"'$t', n_$t").mkString(", ")
    q109EventPivot(s, dir).select(col("hour_ts"),
      expr(s"stack(${PivotTypes.size}, $stackArgs) AS (event_type, n)"))
  }

  // ---- q133: salted equi-join (the skew tool under the oracle gate) ----
  // Salting splits a hot key across saltFactor sub-keys (deterministic
  // hash salt on the big side, explode-replicated small side) so one
  // reducer never owns a heavy hitter AQE can't split. The oracle is
  // the PLAIN join — equality proves salting is semantics-free, which
  // is the entire point of the technique.
  private val SaltFactor = 8
  def q133SaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val li = graft.Tables.lineitem(s, dir)
      .select(col("l_suppkey"), cents(col("l_extendedprice")).as("cents"))
    val sup = graft.Tables.supplier(s, dir)
      .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
    Skew.saltedEquiJoin(li, sup, Seq("l_suppkey"), SaltFactor)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_items"),
        sumFp(col("cents")).as("total_cents"))
  }

  // ---- q124: market-basket itemset mining (top pairs + lift) ----
  // Association-rule support/lift over order baskets: distinct
  // (order, part) items, within-order pair expansion — bounded by
  // BASKET size squared, never corpus size, the property that keeps
  // this viable at 100 TB — then a counting aggregate keyed on the
  // pair and TakeOrdered for the top-k (no global sort). Lift runs in
  // DECIMAL(38,0): support·N·10⁶ overflows BIGINT at ~10⁹ orders.
  private val BasketTopK = 20
  def q124Itemsets(s: SparkSession, dir: String): DataFrame = {
    // persisted (Caches-tracked): the basket frame feeds FOUR consumers
    // (the eager order count, the per-item counts, and both sides of
    // the within-basket self-join) — without materialization each one
    // re-runs the lineitem scan + distinct shuffle
    val items = graft.llm.Caches.persistTracked(
      graft.Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct())
    val n = items.select(col("ok")).distinct().count()
    val cnt = items.groupBy(col("pk")).agg(count(lit(1)).as("c"))
    // Spread.byKey on the basket key: the within-basket pair expansion
    // is CPU-heavy with tiny bytes, which AQE's byte-based coalescing
    // under-parallelizes (r19); no-op at production input sizes
    val itemsK = graft.llm.Spread.byKey(items, col("ok"))
    val top = itemsK.select(col("ok"), col("pk").as("item_a"))
      .join(itemsK.select(col("ok"), col("pk").as("item_b")), "ok")
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("support"))
      .orderBy(col("support").desc, col("item_a"), col("item_b"))
      .limit(BasketTopK)
    top
      .join(cnt.select(col("pk").as("item_a"), col("c").as("ca")), "item_a")
      .join(cnt.select(col("pk").as("item_b"), col("c").as("cb")), "item_b")
      .select(col("item_a"), col("item_b"), col("support"),
        expr(s"cast((cast(support as decimal(38,0)) * ${n}L * 1000000L)" +
          " div (cast(ca as decimal(38,0)) * cb) as bigint)").as("lift_ppm"))
  }

  // ---- q134: directed association rules (confidence + lift) ----
  // q124 mines the undirected pair support; this derives the actual
  // RULES a recommender consumes: both directions of every pair with
  // support >= MinRuleSupport, confidence_ppm = support·10⁶/c(A) and
  // the symmetric lift. Same within-basket expansion (bounded by
  // basket size squared, never corpus size); the item-count frame is
  // aggregate-sized, so both enrichment joins broadcast. Confidence
  // runs in DECIMAL(38,0) for the same ~10⁹-order headroom as q124.
  private val MinRuleSupport = 2L
  def q134AssocRules(s: SparkSession, dir: String): DataFrame = {
    // persisted for the same four-consumer reason as q124 — and the
    // two queries' basket frames are plan-identical, so the tracked
    // cache is shared between them within a session
    val items = graft.llm.Caches.persistTracked(
      graft.Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct())
    val n = items.select(col("ok")).distinct().count()
    val cnt = items.groupBy(col("pk")).agg(count(lit(1)).as("c"))
    // Spread.byKey on the basket key (the q124 rationale)
    val itemsK = graft.llm.Spread.byKey(items, col("ok"))
    val pairs = itemsK.select(col("ok"), col("pk").as("a"))
      .join(itemsK.select(col("ok"), col("pk").as("b")), "ok")
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= MinRuleSupport)
    // both rule directions from ONE pass over the pair aggregate (a
    // 2-struct explode) instead of a unionAll that re-ran the basket
    // self-join + pair aggregate per branch (r19)
    val rules = pairs
      .select(explode(array(
        struct(col("a").as("antecedent"), col("b").as("consequent"),
          col("support")),
        struct(col("b").as("antecedent"), col("a").as("consequent"),
          col("support")))).as("r"))
      .select(col("r.antecedent").as("antecedent"),
        col("r.consequent").as("consequent"),
        col("r.support").as("support"))
    rules
      .join(broadcast(cnt.select(col("pk").as("antecedent"), col("c").as("ca"))),
        "antecedent")
      .join(broadcast(cnt.select(col("pk").as("consequent"), col("c").as("cb"))),
        "consequent")
      .select(col("antecedent"), col("consequent"), col("support"),
        expr("cast((cast(support as decimal(38,0)) * 1000000L) div ca as bigint)")
          .as("conf_ppm"),
        expr(s"cast((cast(support as decimal(38,0)) * ${n}L * 1000000L)" +
          " div (cast(ca as decimal(38,0)) * cb) as bigint)").as("lift_ppm"))
  }

  // ---- q13: fact⋈dim join (part lookup) ----
  // No broadcast hint: `part` scales with SF, so a forced broadcast
  // OOMs executors at 100×. AQE picks broadcast-hash when the measured
  // size is under the threshold and falls back to shuffle join above it.
  def q13PartTypeRevenue(s: SparkSession, dir: String): DataFrame =
    graft.Tables.lineitem(s, dir)
      .join(graft.Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_type"))
      .agg(count(lit(1)).as("n_items"),
        sumFp(cents(col("l_extendedprice"))).as("total_cents"))
      .orderBy(col("p_type"))

  // ---- q25: 4-key LEFT OUTER join (the reference's only join shape,
  // `governance/main.py:51-62` — composite-key left join where
  // unmatched rows survive with nulls) ----
  def q25LeftJoinTags(s: SparkSession, dir: String): DataFrame = {
    val li = graft.Tables.lineitem(s, dir)
    val keys = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
    val tags = li.filter(col("l_quantity") > 48)
      .select(keys.map(col) :+ cents(col("l_extendedprice")).as("tag_fp"): _*)
    li.join(tags, keys, "left")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("tag_fp")).as("n_tagged"), // count() skips the nulls
        sumFp(coalesce(col("tag_fp"), lit(0L))).as("sum_tag"))
      .orderBy(col("l_returnflag"))
  }

  // ---- q30: semi-structured props parsing (JSON Schema → from_json) ----
  // the schema compiler (§1.4) drives the runtime parse: JSON Schema →
  // StructType → from_json over the events.props string column
  def q30PropsJson(s: SparkSession, dir: String): DataFrame = {
    val schema = graft.schema.JsonSchemaToStruct.convert(
      """{"properties": {"k": {"type": "integer"}}}""")
    graft.Tables.events(s, dir)
      .withColumn("rec", from_json(col("props"), schema))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("rec.k")).as("sum_k"),
        min(col("rec.k")).as("min_k"),
        max(col("rec.k")).as("max_k"))
      .orderBy(col("event_type"))
  }

  // ---- q33: supplier-side revenue rollup (3-way join, last unused table) ----
  def q33SupplierRevenue(s: SparkSession, dir: String): DataFrame =
    graft.Tables.lineitem(s, dir)
      .join(graft.Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(graft.Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        countDistinct(col("s_suppkey")).as("n_suppliers"),
        count(lit(1)).as("n_items"),
        sumFp(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4))
          .as("revenue_fp"))
      .orderBy(col("n_name"))

  // ---- q93: snapshot diff (the CDC arms behind the PG merge) ----
  // The new snapshot is synthesized from the old by key arithmetic —
  // every 13th supplier deleted, every 7th rebalanced, every 11th
  // cloned to a fresh key — so the oracle regenerates both sides and
  // classifies with a FULL OUTER JOIN, while the Spark side must land
  // on the identical verdict per key through SnapshotDiff's null-safe
  // column comparison.
  /** The q93/q94 synthesized "new" supplier snapshot: every 13th key
    * deleted, every 7th rebalanced, every 11th cloned to a fresh key —
    * ONE definition so diff and SCD2 cannot drift apart. */
  private def newSupplierSnapshot(old: DataFrame): DataFrame = {
    val updated = old.filter(pmod(col("s_suppkey"), lit(13)) =!= 0)
      .withColumn("s_acctbal",
        when(pmod(col("s_suppkey"), lit(7)) === 0, col("s_acctbal") + 10.0)
          .otherwise(col("s_acctbal")))
    val inserted = old.filter(pmod(col("s_suppkey"), lit(11)) === 0)
      .select((col("s_suppkey") + 100000L).as("s_suppkey"),
        col("s_name"), col("s_nationkey"), col("s_acctbal"))
    updated.unionByName(inserted)
  }

  def q93SnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val old = graft.Tables.supplier(s, dir)
    graft.sync.SnapshotDiff.diff(old, newSupplierSnapshot(old), Seq("s_suppkey"))
  }

  // ---- q94: SCD2 snapshot apply (versioned-dimension maintenance) ----
  // The supplier dimension starts as all-current versions (valid_from
  // 0, open-ended); applying the q93 snapshot at ts=100 must close the
  // deleted/updated versions, open the updated/inserted ones, and pass
  // the unchanged through — the oracle replays all three arms over the
  // regenerated snapshot.
  def q94Scd2(s: SparkSession, dir: String): DataFrame = {
    val old = graft.Tables.supplier(s, dir)
    val dim = old.withColumn("valid_from", lit(0L))
      .withColumn("valid_to", lit(null).cast("bigint"))
    graft.sync.Scd2.applySnapshot(dim, newSupplierSnapshot(old),
      Seq("s_suppkey"), batchTs = 100L)
  }

  // ---- q205: erasure-cascade plan (right-to-be-forgotten audit) ----
  // The plan a GDPR/consent deletion job must present BEFORE touching
  // data: given a forget-set of customers (the demo predicate
  // c_custkey % 41 = 0 — in production an uploaded key list), the
  // exact blast radius down the foreign-key chain: customers
  // themselves, their orders, and those orders' lineitems, each as
  // (rows to delete, delete ppm). Deletion must see the SAME cascade
  // the plan priced, so the plan is pure keyed joins: forget keys →
  // orders by o_custkey → lineitems semi-joined on the deleted
  // orderkeys. Scale: two key-projected joins (key sets only — no
  // payload columns move), three count aggregates folded to one row
  // each; at 100 TB the orderkey set shuffles as 8-byte keys.
  def q205ErasurePlan(s: SparkSession, dir: String): DataFrame = {
    def card(tbl: String, total: DataFrame, del: DataFrame): DataFrame = {
      val t = total.agg(count(lit(1)).cast("bigint").as("n_rows"))
      val d = del.agg(count(lit(1)).cast("bigint").as("n_delete"))
      t.crossJoin(d).select(lit(tbl).as("tbl"), col("n_rows"),
        col("n_delete"),
        expr("cast(cast(n_delete as decimal(38,0)) * 1000000 " +
          "div greatest(n_rows, 1L) as bigint)").as("delete_ppm"))
    }
    val cust = graft.Tables.customer(s, dir)
    val orders = graft.Tables.orders(s, dir)
    val li = graft.Tables.lineitem(s, dir)
    val forgetC = cust.filter(pmod(col("c_custkey"), lit(41)) === 0)
      .select(col("c_custkey"))
    // the deleted-orderkey set feeds its own count AND the lineitem
    // cascade → persisted (key column only)
    val delOKeys = graft.llm.Caches.persistTracked(
      orders.join(forgetC, col("o_custkey") === col("c_custkey"), "left_semi")
        .select(col("o_orderkey")))
    val delL = li.join(delOKeys,
      col("l_orderkey") === col("o_orderkey"), "left_semi")
    card("customer", cust.select(col("c_custkey")), forgetC)
      .unionByName(card("orders", orders.select(col("o_orderkey")), delOKeys))
      .unionByName(card("lineitem", li.select(col("l_orderkey")),
        delL.select(col("l_orderkey"))))
  }

  // ---- q214: sole-late-supplier (the TPC-H Q21 shape) ----
  // "Which supplier alone held up multi-supplier orders?" — the
  // classic exists/not-exists double correlation, expressed
  // Spark-first WITHOUT correlated subqueries: one (order, supplier)
  // aggregate (bool_or of lateness), then both existence conditions
  // as window counts over the per-order supplier rows — exists
  // another supplier ⇔ ns ≥ 2, not exists another late one ⇔ nl = 1.
  // Scale: lineitem⋈orders shuffles once on the order key; the
  // windows run over the (order, supplier) AGGREGATE (≤ a few rows
  // per order), never the raw lineitems; no cartesian, no rewrite
  // into three self-joins of the fact table. Lateness = shipped more
  // than 60 days after the order date, on 'F' orders.
  private val LateDays = 60
  def q214SoleLateSupplier(s: SparkSession, dir: String): DataFrame = {
    val l = graft.Tables.lineitem(s, dir)
      .join(graft.Tables.orders(s, dir)
          .filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"),
        (col("l_shipdate") >
          col("o_orderdate") + expr(s"interval $LateDays days")).as("late"))
    val ps = l.groupBy(col("ok"), col("sk"))
      .agg(expr("bool_or(late)").as("has_late"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("ok"))
    ps.withColumn("ns", count(lit(1)).over(w))
      .withColumn("nl",
        sum(when(col("has_late"), 1L).otherwise(0L)).over(w))
      .filter(col("has_late") && col("ns") >= 2 && col("nl") === 1)
      .groupBy(col("sk"))
      .agg(count(lit(1)).as("numwait"))
      .join(graft.Tables.supplier(s, dir)
        .select(col("s_suppkey").as("sk"), col("s_name")), Seq("sk"))
      .select(col("s_name"), col("numwait"))
  }

  // ---- q221: local-supplier regional revenue (the TPC-H Q5 shape) ----
  // The 6-table join-order stress test: lineitem⋈orders⋈customer⋈
  // supplier⋈nation⋈region with the LOCAL-supplier condition
  // (s_nationkey = c_nationkey — a join predicate BETWEEN two
  // dimensions reached through different fact paths, the thing naive
  // join trees get wrong), a two-year date window, and the
  // discounted-revenue fixed point. Spark-first: the plan is
  // declared flat and Catalyst/AQE pick the order; only the two
  // fixed-cardinality dims carry broadcast hints (q3's rule — the
  // SF-proportional sides must stay hint-free so 100× data cannot
  // OOM a forced broadcast).
  def q221RegionalRevenue(s: SparkSession, dir: String): DataFrame =
    graft.Tables.lineitem(s, dir)
      .join(graft.Tables.orders(s, dir)
          .filter(col("o_orderdate") >= ts("1996-01-01") &&
            col("o_orderdate") < ts("1998-01-01")),
        col("l_orderkey") === col("o_orderkey"))
      .join(graft.Tables.customer(s, dir),
        col("o_custkey") === col("c_custkey"))
      .join(graft.Tables.supplier(s, dir),
        col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
      .join(broadcast(graft.Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(graft.Tables.region(s, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sumFp(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4))
          .as("revenue_fp"),
        count(lit(1)).as("n_items"))

  // ---- q222: small-quantity-order revenue (the TPC-H Q17 shape) ----
  // The correlated-scalar-subquery classic ("lineitems under 20% of
  // their part's average quantity"), Spark-first: the per-part
  // average is a WINDOW over the already-joined rows — one shuffle
  // on the part key serves the join AND the average, where the
  // textbook nested form scans lineitem twice and correlates per
  // row. The brand filter prunes parts BEFORE the fact join (pushed
  // to the part scan, broadcast). Determinism: the average is one
  // IEEE double division and 0.2·avg one multiply — both engines
  // compute bit-identical doubles, and the revenue lands in the q1
  // fixed point.
  def q222SmallQuantityRevenue(s: SparkSession, dir: String): DataFrame = {
    val parts = graft.Tables.part(s, dir)
      .filter(col("p_brand") === "Brand#4")
      .select(col("p_partkey"), col("p_brand"))
    val joined = graft.Tables.lineitem(s, dir)
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("p_partkey"))
    joined
      .withColumn("__avg_qty",
        sum(col("l_quantity")).over(w) / count(lit(1)).over(w))
      .filter(col("l_quantity") < lit(0.2) * col("__avg_qty"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"),
        sumFp(cents(col("l_extendedprice"))).as("revenue_cents"))
  }

  // ---- q228: dominant-share supplier (the TPC-H Q20 shape) ----
  // The remaining classic: Q20's NESTED SEMI-JOIN with a correlated
  // threshold — "suppliers holding a dominant position in some
  // screened part". The correlated scalar (Q20 compares stock against
  // half the part's shipped volume) is a WINDOW over the one
  // (part, supplier) aggregate: a supplier qualifies for a part when
  // it shipped MORE than half that part's 1996 volume. Then two true
  // semi-joins, innermost-out exactly like Q20: qualifying pairs ⋉
  // name-screened parts (broadcast — the q222 filtered-dim rule),
  // suppliers ⋉ qualifying supplier keys (no hint — SF-proportional,
  // the q221 rule). No correlated subquery, no second lineitem scan,
  // no fact self-join; one shuffle on (part, supplier), one window
  // on its aggregate, one shuffle into the supplier semi-join.
  // Quantities are integer-valued by the corpus contract — cast to
  // BIGINT so the sums replay exactly.
  def q228DominantSupplier(s: SparkSession, dir: String): DataFrame = {
    val redParts = graft.Tables.part(s, dir)
      .filter(col("p_name").startsWith("red"))
      .select(col("p_partkey"))
    val ps = graft.Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
        col("l_shipdate") < ts("1997-01-01 00:00:00"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity").cast("bigint")).as("sq"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_partkey"))
    val dominant = ps.withColumn("pt", sum(col("sq")).over(w))
      .filter(col("sq") * 2 > col("pt"))
      .join(broadcast(redParts),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .select(col("l_suppkey"))
    graft.Tables.supplier(s, dir)
      .join(broadcast(graft.Tables.nation(s, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_name"), col("n_name"))
  }

  // ---- q229: lapsed above-average customers (the TPC-H Q22 shape) ----
  // The last classic on the board: Q22's GLOBAL-scalar threshold +
  // anti-join ("customers above the average positive balance with no
  // recent activity"). The scalar subquery is a one-row aggregate
  // broadcast-crossed onto the customer scan (never recomputed per
  // row); "no recent orders" is a true LEFT ANTI against the
  // date-pruned order keys (the filter reaches the orders scan);
  // balances ride the q1 cents fixed point so the threshold
  // comparison and the rollup sum replay exactly (money is 2-decimal
  // by the corpus contract, so cents > 0 ⇔ balance > 0). The
  // balance screen runs BEFORE the anti-join — Q22's own trick —
  // so the anti probe side is the rich slice, not the full table.
  def q229LapsedCustomers(s: SparkSession, dir: String): DataFrame = {
    val cust = graft.Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_nationkey"),
        cents(col("c_acctbal")).as("bal"))
    val threshold = cust.filter(col("bal") > 0L)
      .agg(expr("sum(bal) div count(1)").cast("bigint").as("__thr"))
    val recent = graft.Tables.orders(s, dir)
      .filter(col("o_orderdate") >= ts("2001-01-01 00:00:00"))
      .select(col("o_custkey"))
    cust.crossJoin(broadcast(threshold))
      .filter(col("bal") > col("__thr"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(graft.Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("numcust"),
        sumFp(col("bal")).as("total_bal_cents"))
  }

  // ---- q223: customer order-count distribution (TPC-H Q13 shape) ----
  // The double-aggregate with an outer join underneath: every
  // customer's order count — INCLUDING the zero-order customers the
  // inner-join formulation silently drops (q8 proves they exist) —
  // then the histogram of those counts. count(o_orderkey) over the
  // left join is the null-aware count that makes the zero bucket
  // real. Two shuffles: the join key, then the histogram key.
  def q223CustomerDistribution(s: SparkSession, dir: String): DataFrame =
    graft.Tables.customer(s, dir)
      .join(graft.Tables.orders(s, dir),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))

  // ---- q240: bilateral trade volume (the TPC-H Q7 shape) ----
  // Two-nation shipping volume by year and direction. Spark-first:
  // the nation filter lands on the BROADCAST dims, so supplier and
  // customer are pre-reduced to the two qualifying nations before
  // they meet the fact — the fact scan shuffles only qualifying
  // rows, and the direction condition collapses to `supp != cust`
  // once both sides are known to be in the pair. Dims broadcast,
  // SF-proportional sides hint-free (the q221 discipline).
  private val TradeNationA = "NATION_1"
  private val TradeNationB = "NATION_2"
  def q240NationTrade(s: SparkSession, dir: String): DataFrame = {
    val pair = Seq(TradeNationA, TradeNationB)
    val suppAB = graft.Tables.supplier(s, dir)
      .select(col("s_suppkey"), col("s_nationkey"))
      .join(broadcast(graft.Tables.nation(s, dir)
          .filter(col("n_name").isin(pair: _*))
          .select(col("n_nationkey").as("__snk"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("__snk"))
      .select(col("s_suppkey"), col("supp_nation"))
    val custAB = graft.Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_nationkey"))
      .join(broadcast(graft.Tables.nation(s, dir)
          .filter(col("n_name").isin(pair: _*))
          .select(col("n_nationkey").as("__cnk"), col("n_name").as("cust_nation"))),
        col("c_nationkey") === col("__cnk"))
      .select(col("c_custkey"), col("cust_nation"))
    graft.Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= ts("1999-01-01 00:00:00") &&
        col("l_shipdate") < ts("2001-01-01 00:00:00"))
      .join(graft.Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(custAB, col("o_custkey") === col("c_custkey"))
      .join(suppAB, col("l_suppkey") === col("s_suppkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("bigint").as("l_year"))
      .agg(sumFp(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4))
        .as("volume_fp"))
  }

  // ---- q241: nation market share (the TPC-H Q8 shape) ----
  // "What share of a region's revenue in one part type does nation N
  // supply, per year" — the conditional-sum-over-total classic. ONE
  // fact pass produces both the numerator (CASE on supplier nation)
  // and the denominator; the share is integer ppm on the q1 fixed
  // point, so the DuckDB replay is exact. Region/nation broadcast;
  // the part-type and customer-region reductions ride hint-free
  // semi-joins (both sides SF-proportional).
  private val ShareRegion = "EUROPE"
  private val SharePartType = "PROMO"
  private val ShareNation = "NATION_1"
  def q241MarketShare(s: SparkSession, dir: String): DataFrame = {
    val promoParts = graft.Tables.part(s, dir)
      .filter(col("p_type") === SharePartType).select(col("p_partkey"))
    val custRegion = graft.Tables.customer(s, dir)
      .join(broadcast(graft.Tables.nation(s, dir)
          .join(broadcast(graft.Tables.region(s, dir)
              .filter(col("r_name") === ShareRegion)),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"))
    val suppNation = graft.Tables.supplier(s, dir)
      .join(broadcast(graft.Tables.nation(s, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    graft.Tables.lineitem(s, dir)
      .join(promoParts, col("l_partkey") === col("p_partkey"), "left_semi")
      .join(graft.Tables.orders(s, dir)
          .filter(col("o_orderdate") >= ts("1999-01-01 00:00:00") &&
            col("o_orderdate") < ts("2001-01-01 00:00:00"))
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(custRegion, col("o_custkey") === col("c_custkey"), "left_semi")
      .join(suppNation, col("l_suppkey") === col("s_suppkey"))
      .withColumn("vol", cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4))
      .groupBy(year(col("o_orderdate")).cast("bigint").as("o_year"))
      .agg(sum(when(col("supp_nation") === ShareNation, col("vol")).otherwise(0L))
          .cast("bigint").as("nation_volume_fp"),
        sum(col("vol")).cast("bigint").as("total_volume_fp"))
      .withColumn("share_ppm",
        expr("cast(cast(nation_volume_fp as decimal(38,0)) * 1000000 " +
          "div greatest(total_volume_fp, 1L) as bigint)"))
  }

  // ---- q242: important parts (the TPC-H Q11 shape) ----
  // "Parts whose accumulated value exceeds a fraction of the GLOBAL
  // total" — the group-having-vs-global-scalar classic. Q11's fixed
  // fraction silently empties as SF grows; this is the scale-free
  // variant (value > 1.5× the mean part value), same plan shape. The
  // per-part aggregate is persisted ONCE and feeds both the one-row
  // total (broadcast back) and the filter — no second fact scan, no
  // correlated subquery.
  def q242ImportantParts(s: SparkSession, dir: String): DataFrame = {
    val pv = graft.llm.Caches.persistTracked(
      graft.Tables.lineitem(s, dir)
        .groupBy(col("l_partkey"))
        .agg(sumFp(cents(col("l_extendedprice"), 4)).as("value_fp")))
    val tot = pv.agg(sum(col("value_fp")).cast("decimal(38,0)").as("__total"),
      count(lit(1)).as("__np"))
    pv.crossJoin(broadcast(tot))
      .filter(expr("cast(value_fp as decimal(38,0)) * __np * 2 > 3 * __total"))
      .join(graft.Tables.part(s, dir).select(col("p_partkey"), col("p_name")),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_partkey"), col("p_name"), col("value_fp"))
  }

  // ---- q243: large-quantity orders (the TPC-H Q18 shape) ----
  // The group-filter-join-back classic ("orders above 250 total
  // units, with their customer"). The HAVING runs map-side-combined
  // on the fact BEFORE any wide row exists; only qualifying order
  // keys (a few per ten thousand) reach the orders/customer joins.
  // l_quantity is integral-valued, so the bigint sum replays exactly.
  private val LargeOrderQty = 250L
  def q243LargeOrders(s: SparkSession, dir: String): DataFrame = {
    val oq = graft.Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("bigint")).as("sum_qty"))
      .filter(col("sum_qty") > LargeOrderQty)
    graft.Tables.orders(s, dir)
      .join(oq, col("o_orderkey") === col("l_orderkey"))
      .join(graft.Tables.customer(s, dir).select(col("c_custkey"), col("c_name")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), cents(col("o_totalprice")).as("total_cents"),
        col("sum_qty"))
  }

  // ---- q244: disjunctive-predicate revenue (the TPC-H Q19 shape) ----
  // Revenue under an OR of (brand, size band, quantity band) triples
  // — the classic test of DISJUNCTIVE pushdown: Catalyst extracts the
  // common `p_brand IN (...)` from the OR and pushes it to the part
  // scan, so the join sees three brands' parts instead of all of
  // them, while the full disjunction evaluates post-join in one
  // codegen'd predicate. One row out.
  def q244DisjunctiveRevenue(s: SparkSession, dir: String): DataFrame =
    graft.Tables.lineitem(s, dir)
      .join(graft.Tables.part(s, dir)
          .select(col("p_partkey"), col("p_brand"), col("p_size")),
        col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
          col("l_quantity").between(20, 30)))
      .agg(sumFp(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4))
          .as("revenue_fp"),
        count(lit(1)).cast("bigint").as("n_items"))

  // ---- q245: top revenue supplier (the TPC-H Q15 shape) ----
  // The view-then-max classic ("the quarter's best supplier(s),
  // ties kept"). The supplier-sized revenue aggregate persists once
  // and feeds both the one-row max (broadcast back) and the filter —
  // the textbook formulation scans the view twice; a global window
  // would single-partition the supplier frame. Ties survive because
  // the filter is an equality against the max, not a LIMIT 1.
  def q245TopSupplier(s: SparkSession, dir: String): DataFrame = {
    val rev = graft.llm.Caches.persistTracked(
      graft.Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= ts("2000-01-01 00:00:00") &&
          col("l_shipdate") < ts("2000-04-01 00:00:00"))
        .groupBy(col("l_suppkey"))
        .agg(sumFp(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4))
          .as("total_revenue_fp")))
    val mx = rev.agg(max(col("total_revenue_fp")).as("__mx"))
    rev.crossJoin(broadcast(mx))
      .filter(col("total_revenue_fp") === col("__mx"))
      .join(graft.Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue_fp"))
  }

  // ---- q253: min-cost regional supplier (the TPC-H Q2 shape) ----
  // "For each part in a slice, the region's cheapest supplier(s)" —
  // the classic is a correlated MIN subquery re-executed per part;
  // here the (part, supplier) cost aggregate is computed ONCE and the
  // per-part minimum is a window over it, ties kept by equality. The
  // region reduction lands on the SUPPLIER side before the fact
  // (broadcast nation⋈region), and the part slice semi-joins the fact
  // before any aggregation — the fact scan shuffles only qualifying
  // rows. Unit cost replays exactly: floor((price*100)/qty) is one
  // IEEE multiply + divide + floor in both engines.
  private val MinCostRegion = "EUROPE"
  def q253MinCostSupplier(s: SparkSession, dir: String): DataFrame = {
    val sliceParts = graft.Tables.part(s, dir)
      .filter(col("p_type") === "LARGE" && col("p_size") <= 10)
      .select(col("p_partkey"), col("p_name"))
    val regionSupp = graft.Tables.supplier(s, dir)
      .join(broadcast(graft.Tables.nation(s, dir)
          .join(broadcast(graft.Tables.region(s, dir)
              .filter(col("r_name") === MinCostRegion)),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"),
        cents(col("s_acctbal")).as("acctbal_cents"))
    val costs = graft.Tables.lineitem(s, dir)
      .join(sliceParts.select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .join(regionSupp.select(col("s_suppkey")),
        col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(floor(col("l_extendedprice") * lit(100.0) / col("l_quantity"))
        .cast("bigint")).as("cost_cents"))
    costs
      .withColumn("__best",
        min(col("cost_cents")).over(Window.partitionBy(col("l_partkey"))))
      .filter(col("cost_cents") === col("__best"))
      .join(sliceParts, col("l_partkey") === col("p_partkey"))
      .join(regionSupp, col("l_suppkey") === col("s_suppkey"))
      .select(col("p_partkey"), col("p_name"), col("s_name"), col("n_name"),
        col("acctbal_cents"), col("cost_cents"))
  }

  // ---- q254: shipping priority top-10 (the TPC-H Q3 shape) ----
  // Segment-filtered unshipped revenue, top 10 orders. The top-k is
  // `orderBy(...).limit(10)` — Spark plans TakeOrderedAndProject, a
  // per-partition bounded heap + k-row driver merge, NOT a global
  // sort: the 100 TB spelling. Total deterministic order (revenue
  // desc, orderkey asc) makes the cut exact; the segment filter
  // reduces customer before it meets orders (hint-free, both sides
  // SF-proportional).
  private val ShipPrioDate = "2000-06-01 00:00:00"
  def q254ShippingPriority(s: SparkSession, dir: String): DataFrame =
    graft.Tables.lineitem(s, dir)
      .filter(col("l_shipdate") > ts(ShipPrioDate))
      .join(graft.Tables.orders(s, dir)
          .filter(col("o_orderdate") < ts(ShipPrioDate))
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
            col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .join(graft.Tables.customer(s, dir)
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sumFp(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4))
        .as("revenue_fp"))
      .orderBy(col("revenue_fp").desc, col("o_orderkey").asc)
      .limit(10)

  // ---- q255: product-line profit (the TPC-H Q9 shape) ----
  // Profit by supplier nation × year over a part-name slice. The
  // testdata has no partsupp, so unit cost is p_retailprice (the
  // same multi-join shape: fact ⋈ part ⋈ orders ⋈ supplier ⋈
  // nation). Profit stays in integer algebra — revenue at 1e-4
  // fixed point minus retail*qty at the same scale — so the DECIMAL
  // accumulate replays as DuckDB HUGEINT bit-for-bit. Nation
  // broadcasts; everything else is SF-proportional and hint-free.
  def q255ProductProfit(s: SparkSession, dir: String): DataFrame =
    graft.Tables.lineitem(s, dir)
      .join(graft.Tables.part(s, dir)
          .filter(col("p_name").like("%gear%"))
          .select(col("p_partkey"), cents(col("p_retailprice"), 4).as("__rp")),
        col("l_partkey") === col("p_partkey"))
      .join(graft.Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(graft.Tables.supplier(s, dir)
          .select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(graft.Tables.nation(s, dir)
          .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .withColumn("amount_fp",
        cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4) -
          col("__rp") * col("l_quantity").cast("bigint"))
      .groupBy(col("n_name"), year(col("o_orderdate")).cast("bigint").as("o_year"))
      .agg(sumFp(col("amount_fp")).as("profit_fp"))

  // ---- q256: returned-item report (the TPC-H Q10 shape) ----
  // Customers who returned the most revenue in a half-year — the
  // group-join-topk classic. Revenue aggregates on the fact FIRST
  // (map-side combined per customer), then joins the customer/nation
  // attributes; top 20 rides TakeOrderedAndProject under the same
  // total order discipline as q254.
  def q256ReturnedItems(s: SparkSession, dir: String): DataFrame = {
    val rev = graft.Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R")
      .join(graft.Tables.orders(s, dir)
          .filter(col("o_orderdate") >= ts("1999-01-01 00:00:00") &&
            col("o_orderdate") < ts("1999-07-01 00:00:00"))
          .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sumFp(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4))
        .as("revenue_fp"))
    rev
      .join(graft.Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(graft.Tables.nation(s, dir)
          .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"),
        cents(col("c_acctbal")).as("acctbal_cents"), col("n_name"),
        col("revenue_fp"))
      .orderBy(col("revenue_fp").desc, col("c_custkey").asc)
      .limit(20)
  }

  // ---- q257: late-shipment priority classes (the TPC-H Q12 shape) ----
  // The two-tier CASE-count classic ("per shipment class, how many
  // late lines carried critical vs non-critical orders"). The
  // testdata has no l_shipmode/commitdate, so the class axis is
  // l_linestatus and lateness is ship > order + 30 days — the plan
  // shape is identical: one fact⋈orders pass, the lateness predicate
  // filters BEFORE the aggregate, and both tiers come out of the same
  // grouped pass as conditional counts.
  private val ShipLateDays = 30
  def q257LateShipmentPriority(s: SparkSession, dir: String): DataFrame =
    graft.Tables.lineitem(s, dir)
      .join(graft.Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") >
        col("o_orderdate") + expr(s"interval $ShipLateDays days"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).cast("bigint").as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).cast("bigint").as("low_line_count"))

  // ---- q258: promo revenue share (the TPC-H Q14 shape) ----
  // What fraction of one month's revenue came from promo parts — the
  // conditional-sum-over-total-in-one-pass classic (the q241 ppm
  // discipline: numerator and denominator from the SAME grouped pass,
  // share as integer ppm so the replay is exact). Part join carries
  // only the type flag; the month filter pushes to the fact scan.
  def q258PromoShare(s: SparkSession, dir: String): DataFrame =
    graft.Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= ts("2000-03-01 00:00:00") &&
        col("l_shipdate") < ts("2000-04-01 00:00:00"))
      .join(graft.Tables.part(s, dir)
          .select(col("p_partkey"), (col("p_type") === "PROMO").as("__promo")),
        col("l_partkey") === col("p_partkey"))
      .withColumn("vol", cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4))
      .agg(
        sum(when(col("__promo"), col("vol")).otherwise(0L)).cast("bigint")
          .as("promo_revenue_fp"),
        sum(col("vol")).cast("bigint").as("total_revenue_fp"))
      .withColumn("promo_share_ppm",
        expr("cast(cast(promo_revenue_fp as decimal(38,0)) * 1000000 " +
          "div greatest(total_revenue_fp, 1L) as bigint)"))

  // ---- q259: supplier diversity per part config (the TPC-H Q16 shape) ----
  // "How many distinct suppliers stock each (brand, type, size)
  // config, excluding a brand, a type, and blacklisted suppliers" —
  // the count-distinct + NOT-IN classic. The NOT IN is a LEFT ANTI
  // join (null-safe, distributed); the part exclusions push to the
  // part scan; the supplier bridge is the fact's (part, supp) pairs,
  // distinct-counted per config. The blacklist is key arithmetic
  // (every 13th supplier) — the q205 planted-slice discipline.
  def q259SupplierDiversity(s: SparkSession, dir: String): DataFrame =
    graft.Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_suppkey"))
      .join(graft.Tables.supplier(s, dir)
          .filter(col("s_suppkey") % 13 === 0).select(col("s_suppkey")),
        col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(graft.Tables.part(s, dir)
          .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO")
          .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q253_min_cost_supplier" -> q253MinCostSupplier _,
    "q254_shipping_priority" -> q254ShippingPriority _,
    "q255_product_profit" -> q255ProductProfit _,
    "q256_returned_items" -> q256ReturnedItems _,
    "q257_late_priority" -> q257LateShipmentPriority _,
    "q258_promo_share" -> q258PromoShare _,
    "q259_supplier_diversity" -> q259SupplierDiversity _,
    "q249_l_diversity" -> q249LDiversity _,
    "q240_nation_trade" -> q240NationTrade _,
    "q241_market_share" -> q241MarketShare _,
    "q242_important_parts" -> q242ImportantParts _,
    "q243_large_orders" -> q243LargeOrders _,
    "q244_disjunctive_revenue" -> q244DisjunctiveRevenue _,
    "q245_top_supplier" -> q245TopSupplier _,
    "q223_customer_distribution" -> q223CustomerDistribution _,
    "q228_dominant_supplier" -> q228DominantSupplier _,
    "q229_lapsed_customers" -> q229LapsedCustomers _,
    "q222_small_quantity_revenue" -> q222SmallQuantityRevenue _,
    "q221_regional_revenue" -> q221RegionalRevenue _,
    "q214_sole_late_supplier" -> q214SoleLateSupplier _,
    "q205_erasure_plan" -> q205ErasurePlan _,
    "q93_snapshot_diff"     -> q93SnapshotDiff _,
    "q94_scd2_apply"        -> q94Scd2 _,
    "q1_pricing_summary"    -> q1PricingSummary _,
    "q2_top_orders"         -> q2TopOrders _,
    "q3_nation_revenue"     -> q3NationRevenue _,
    "q4_priority_semi"      -> q4PrioritySemi _,
    "q5_window_topk"        -> q5WindowTopk _,
    "q6_filtered_revenue"   -> q6FilteredRevenue _,
    "q7_distinct_counts"    -> q7DistinctCounts _,
    "q8_customers_no_orders" -> q8CustomersNoOrders _,
    "q9_events_hourly"      -> q9EventsHourly _,
    "q10_brand_stats"       -> q10BrandStats _,
    "q11_sessions"          -> q11Sessions _,
    "q12_year_priority_rollup" -> q12YearPriorityRollup _,
    "q305_join_preflight" -> q305JoinPreflight _,
    "q13_part_type_revenue" -> q13PartTypeRevenue _,
    "q25_left_join_tags"    -> q25LeftJoinTags _,
    "q30_props_json"        -> q30PropsJson _,
    "q33_supplier_revenue"  -> q33SupplierRevenue _,
    "q109_event_pivot"      -> q109EventPivot _,
    "q114_rolling_spend"    -> q114RollingSpend _,
    "q145_winsorize"        -> q145Winsorize _,
    "q148_session_paths"    -> q148SessionPaths _,
    "q149_fk_audit"         -> q149FkAudit _,
    "q118_skyline"          -> q118Skyline _,
    "q119_cube_grouping"    -> q119CubeGrouping _,
    "q120_zorder_audit"     -> q120ZorderAudit _,
    "q124_itemsets"         -> q124Itemsets _,
    "q134_assoc_rules"      -> q134AssocRules _,
    "q132_unpivot"          -> q132Unpivot _,
    "q133_salted_join"      -> q133SaltedJoin _,
    "q156_column_profile"   -> q156ColumnProfile _,
    "q159_skew_advisor"     -> q159SkewAdvisor _,
    "q162_k_anonymity"      -> q162KAnonymity _,
    "q165_benford"          -> q165Benford _,
  )

  /** DuckDB-dialect oracles. Expression structure mirrors the Spark
    * plans exactly (same literals, same fixed-point floors) so results
    * are bit-identical, not merely close. */
  val oracleSql: Map[String, String] = Map(
    // the window-over-aggregate min with ties kept by equality —
    // same one-pass formulation, no correlated subquery
    "q253_min_cost_supplier" ->
      s"""WITH sr AS (SELECT s_suppkey, s_name, n_name,
         |    CAST(floor(s_acctbal * 100.0) AS BIGINT) AS acctbal_cents
         |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey AND r_name = '$MinCostRegion'),
         |sp AS (SELECT p_partkey, p_name FROM part
         |  WHERE p_type = 'LARGE' AND p_size <= 10),
         |pc AS (SELECT l_partkey, l_suppkey,
         |    CAST(min(CAST(floor(l_extendedprice * 100.0 / l_quantity)
         |      AS BIGINT)) AS BIGINT) AS cost_cents
         |  FROM lineitem
         |  WHERE l_partkey IN (SELECT p_partkey FROM sp)
         |    AND l_suppkey IN (SELECT s_suppkey FROM sr)
         |  GROUP BY 1, 2),
         |w AS (SELECT l_partkey, l_suppkey, cost_cents,
         |    min(cost_cents) OVER (PARTITION BY l_partkey) AS best FROM pc)
         |SELECT p_partkey, p_name, s_name, n_name, acctbal_cents, cost_cents
         |FROM w JOIN sp ON l_partkey = p_partkey
         |JOIN sr ON l_suppkey = s_suppkey
         |WHERE cost_cents = best""".stripMargin,
    // the same total order replayed as ORDER BY + LIMIT
    "q254_shipping_priority" ->
      s"""SELECT o_orderkey, o_orderdate, o_orderpriority,
         |  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000.0)
         |    AS BIGINT)) AS BIGINT) AS revenue_fp
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey AND c_mktsegment = 'BUILDING'
         |WHERE l_shipdate > TIMESTAMP '$ShipPrioDate'
         |  AND o_orderdate < TIMESTAMP '$ShipPrioDate'
         |GROUP BY 1, 2, 3
         |ORDER BY revenue_fp DESC, o_orderkey ASC
         |LIMIT 10""".stripMargin,
    // integer profit algebra; HUGEINT accumulate mirrors the decimal
    "q255_product_profit" ->
      """SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(sum(CAST(CAST(floor(l_extendedprice * (1.0 - l_discount)
        |      * 10000.0) AS BIGINT)
        |    - CAST(floor(p_retailprice * 10000.0) AS BIGINT)
        |      * CAST(l_quantity AS BIGINT) AS HUGEINT)) AS BIGINT) AS profit_fp
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%gear%'
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1, 2""".stripMargin,
    // aggregate-then-join; the same deterministic top-20 cut
    "q256_returned_items" ->
      """WITH rev AS (SELECT o_custkey,
        |    CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
        |      * 10000.0) AS BIGINT)) AS BIGINT) AS revenue_fp
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_returnflag = 'R'
        |    AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1999-07-01 00:00:00'
        |  GROUP BY 1)
        |SELECT c_custkey, c_name,
        |  CAST(floor(c_acctbal * 100.0) AS BIGINT) AS acctbal_cents,
        |  n_name, revenue_fp
        |FROM rev JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY revenue_fp DESC, c_custkey ASC
        |LIMIT 20""".stripMargin,
    // both tiers out of one grouped pass over the late rows
    "q257_late_priority" ->
      s"""SELECT l_linestatus,
         |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
         |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
         |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
         |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE l_shipdate > o_orderdate + INTERVAL $ShipLateDays DAY
         |GROUP BY 1""".stripMargin,
    // numerator and denominator from the same pass; HUGEINT floor-ppm
    "q258_promo_share" ->
      """WITH f AS (SELECT CAST(floor(l_extendedprice * (1.0 - l_discount)
        |      * 10000.0) AS BIGINT) AS vol,
        |    (p_type = 'PROMO') AS promo
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '2000-03-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '2000-04-01 00:00:00')
        |SELECT CAST(sum(CASE WHEN promo THEN vol ELSE 0 END) AS BIGINT)
        |    AS promo_revenue_fp,
        |  CAST(sum(vol) AS BIGINT) AS total_revenue_fp,
        |  CAST(CAST(sum(CASE WHEN promo THEN vol ELSE 0 END) AS HUGEINT)
        |    * 1000000 // greatest(sum(vol), 1) AS BIGINT) AS promo_share_ppm
        |FROM f""".stripMargin,
    // NOT IN replayed as the same anti condition; count(DISTINCT)
    "q259_supplier_diversity" ->
      """SELECT p_brand, p_type, p_size,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand != 'Brand#1' AND p_type != 'PROMO'
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |    WHERE s_suppkey % 13 = 0)
        |GROUP BY 1, 2, 3""".stripMargin,
    // the null-aware count over the left join keeps the zero bucket
    "q223_customer_distribution" ->
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM (SELECT c.c_custkey,
        |    CAST(count(o.o_orderkey) AS BIGINT) AS c_count
        |  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |  GROUP BY 1) x
        |GROUP BY 1""".stripMargin,
    // per-part average as a window over the joined rows (sum/count —
    // the same IEEE division Spark computes), then the 20% gate
    "q222_small_quantity_revenue" ->
      """SELECT p_brand, count(*) AS n_items,
        |  CAST(sum(CAST(floor(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT)
        |    AS revenue_cents
        |FROM (SELECT p.p_brand, l.l_quantity, l.l_extendedprice,
        |    sum(l.l_quantity) OVER (PARTITION BY p.p_partkey)
        |      / count(*) OVER (PARTITION BY p.p_partkey) AS avg_qty
        |  FROM lineitem l
        |  JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE p.p_brand = 'Brand#4') x
        |WHERE l_quantity < 0.2 * avg_qty
        |GROUP BY 1""".stripMargin,
    // the flat 6-way join with the cross-dimension local-supplier
    // predicate; q1's disc-price fixed point
    // the same global-threshold + anti-join formulation; the NOT
    // EXISTS arm carries the date predicate on both sides
    "q229_lapsed_customers" ->
      """WITH b AS (SELECT c_custkey, c_nationkey,
        |    CAST(floor(c_acctbal * 100.0) AS BIGINT) AS bal FROM customer),
        |th AS (SELECT CAST(sum(bal) // count(*) AS BIGINT) AS thr
        |  FROM b WHERE bal > 0),
        |rich AS (SELECT b.c_custkey, b.c_nationkey, b.bal
        |  FROM b JOIN th ON b.bal > th.thr),
        |lapsed AS (SELECT r.* FROM rich r WHERE NOT EXISTS (
        |  SELECT 1 FROM orders o WHERE o.o_custkey = r.c_custkey
        |    AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'))
        |SELECT n_name, CAST(count(*) AS BIGINT) AS numcust,
        |  CAST(sum(bal) AS BIGINT) AS total_bal_cents
        |FROM lapsed JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1""".stripMargin,
    // the same window-over-aggregate threshold + two semi-joins —
    // no correlated subquery on either side
    "q228_dominant_supplier" ->
      """WITH ps AS (SELECT l_partkey AS pk, l_suppkey AS sk,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  GROUP BY 1, 2),
        |dom AS (SELECT pk, sk FROM (SELECT pk, sk, sq,
        |      sum(sq) OVER (PARTITION BY pk) AS pt FROM ps) d
        |  WHERE sq * 2 > pt),
        |fp AS (SELECT DISTINCT dom.sk FROM dom
        |  JOIN part ON pk = p_partkey WHERE p_name LIKE 'red%')
        |SELECT s_name, n_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE s_suppkey IN (SELECT sk FROM fp)""".stripMargin,
    // q162's class spelling joined to order priorities; l per class,
    // then the per-segment rollup
    "q249_l_diversity" ->
      """WITH cls AS (SELECT c_mktsegment, c_nationkey,
        |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
        |    CAST(count(*) AS BIGINT) AS cls_rows,
        |    CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS l
        |  FROM customer JOIN orders ON c_custkey = o_custkey
        |  GROUP BY 1, 2, 3)
        |SELECT c_mktsegment,
        |  CAST(count(*) AS BIGINT) AS n_classes,
        |  CAST(sum(cls_rows) AS BIGINT) AS n_rows,
        |  min(l) AS l_min,
        |  CAST(sum(CASE WHEN l = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_homogeneous,
        |  CAST(sum(CASE WHEN l = 1 THEN cls_rows ELSE 0 END) AS BIGINT)
        |    AS n_exposed_rows
        |FROM cls GROUP BY 1""".stripMargin,
    // nation filters replayed as IN-lists; direction = the pair minus
    // the diagonal; the q1 fixed point keeps the volume exact
    "q240_nation_trade" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
         |  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000.0)
         |    AS BIGINT)) AS BIGINT) AS volume_fp
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '2001-01-01 00:00:00'
         |  AND n1.n_name IN ('$TradeNationA', '$TradeNationB')
         |  AND n2.n_name IN ('$TradeNationA', '$TradeNationB')
         |  AND n1.n_name != n2.n_name
         |GROUP BY 1, 2, 3""".stripMargin,
    // numerator and denominator out of the same grouped pass; the
    // share replayed as HUGEINT floor-ppm
    "q241_market_share" ->
      s"""WITH f AS (SELECT year(o_orderdate) AS o_year,
         |    CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000.0)
         |      AS BIGINT) AS vol,
         |    n1.n_name AS supp_nation
         |  FROM lineitem
         |  JOIN part ON l_partkey = p_partkey AND p_type = '$SharePartType'
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |  JOIN region ON n2.n_regionkey = r_regionkey AND r_name = '$ShareRegion'
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |  WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
         |    AND o_orderdate < TIMESTAMP '2001-01-01 00:00:00')
         |SELECT CAST(o_year AS BIGINT) AS o_year,
         |  CAST(sum(CASE WHEN supp_nation = '$ShareNation' THEN vol ELSE 0 END)
         |    AS BIGINT) AS nation_volume_fp,
         |  CAST(sum(vol) AS BIGINT) AS total_volume_fp,
         |  CAST(CAST(sum(CASE WHEN supp_nation = '$ShareNation' THEN vol ELSE 0 END)
         |      AS HUGEINT) * 1000000
         |    // greatest(sum(vol), 1) AS BIGINT) AS share_ppm
         |FROM f GROUP BY 1""".stripMargin,
    // the group-having-vs-global-scalar shape, scale-free threshold
    "q242_important_parts" ->
      """WITH pv AS (SELECT l_partkey,
        |    CAST(sum(CAST(floor(l_extendedprice * 10000.0) AS BIGINT))
        |      AS BIGINT) AS value_fp
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT CAST(sum(value_fp) AS HUGEINT) AS tot,
        |    CAST(count(*) AS HUGEINT) AS np FROM pv)
        |SELECT p_partkey, p_name, value_fp
        |FROM pv CROSS JOIN t
        |JOIN part ON pv.l_partkey = part.p_partkey
        |WHERE CAST(value_fp AS HUGEINT) * np * 2 > 3 * tot""".stripMargin,
    // HAVING on the fact aggregate, then the join-back
    "q243_large_orders" ->
      s"""SELECT c_name, c_custkey, o_orderkey, o_orderdate,
         |  CAST(floor(o_totalprice * 100.0) AS BIGINT) AS total_cents,
         |  CAST(sum_qty AS BIGINT) AS sum_qty
         |FROM (SELECT l_orderkey,
         |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
         |  FROM lineitem GROUP BY 1
         |  HAVING sum(CAST(l_quantity AS BIGINT)) > $LargeOrderQty) q
         |JOIN orders ON o_orderkey = l_orderkey
         |JOIN customer ON o_custkey = c_custkey""".stripMargin,
    // the disjunction evaluated verbatim on the joined rows
    "q244_disjunctive_revenue" ->
      """SELECT CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
        |    * 10000.0) AS BIGINT)) AS BIGINT) AS revenue_fp,
        |  CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |    AND l_quantity BETWEEN 1 AND 11)
        |  OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
        |    AND l_quantity BETWEEN 10 AND 20)
        |  OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
        |    AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    // view-then-max with ties kept: equality against the scalar max
    "q245_top_supplier" ->
      """WITH rev AS (SELECT l_suppkey,
        |    CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
        |      * 10000.0) AS BIGINT)) AS BIGINT) AS total_revenue_fp
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '2000-04-01 00:00:00'
        |  GROUP BY 1),
        |m AS (SELECT max(total_revenue_fp) AS mx FROM rev)
        |SELECT s_suppkey, s_name, total_revenue_fp
        |FROM rev CROSS JOIN m
        |JOIN supplier ON rev.l_suppkey = supplier.s_suppkey
        |WHERE total_revenue_fp = mx""".stripMargin,
    "q221_regional_revenue" ->
      """SELECT r_name, n_name,
        |  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000.0)
        |    AS BIGINT)) AS BIGINT) AS revenue_fp,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |  AND s_nationkey = c_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1, 2""".stripMargin,
    // the same windowed-existence formulation — both engines count
    // per-order supplier rows, no correlated subqueries to diverge on
    "q214_sole_late_supplier" ->
      s"""WITH l AS (SELECT l_orderkey AS ok, l_suppkey AS sk,
         |    (l_shipdate > o_orderdate + INTERVAL $LateDays DAY) AS late
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  WHERE o_orderstatus = 'F'),
         |ps AS (SELECT ok, sk, bool_or(late) AS has_late FROM l GROUP BY 1, 2),
         |q AS (SELECT sk FROM (SELECT sk, has_late,
         |    count(*) OVER (PARTITION BY ok) AS ns,
         |    sum(CASE WHEN has_late THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY ok) AS nl
         |  FROM ps) x WHERE has_late AND ns >= 2 AND nl = 1)
         |SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
         |FROM q JOIN supplier s ON q.sk = s.s_suppkey
         |GROUP BY 1""".stripMargin,
    // the cascade replayed as IN-subqueries; one UNION ALL row per
    // table with the same HUGEINT ppm spelling
    "q205_erasure_plan" ->
      """WITH fc AS (SELECT c_custkey FROM customer WHERE c_custkey % 41 = 0),
        |dok AS (SELECT o_orderkey FROM orders
        |  WHERE o_custkey IN (SELECT c_custkey FROM fc)),
        |dl AS (SELECT l_orderkey FROM lineitem
        |  WHERE l_orderkey IN (SELECT o_orderkey FROM dok)),
        |c AS (SELECT CAST(count(*) AS BIGINT) AS n FROM customer),
        |o AS (SELECT CAST(count(*) AS BIGINT) AS n FROM orders),
        |l AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem),
        |cd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM fc),
        |od AS (SELECT CAST(count(*) AS BIGINT) AS n FROM dok),
        |ld AS (SELECT CAST(count(*) AS BIGINT) AS n FROM dl)
        |SELECT 'customer' AS tbl, c.n AS n_rows, cd.n AS n_delete,
        |  CAST(CAST(cd.n AS HUGEINT) * 1000000 // greatest(c.n, 1)
        |    AS BIGINT) AS delete_ppm FROM c, cd
        |UNION ALL
        |SELECT 'orders', o.n, od.n,
        |  CAST(CAST(od.n AS HUGEINT) * 1000000 // greatest(o.n, 1)
        |    AS BIGINT) FROM o, od
        |UNION ALL
        |SELECT 'lineitem', l.n, ld.n,
        |  CAST(CAST(ld.n AS HUGEINT) * 1000000 // greatest(l.n, 1)
        |    AS BIGINT) FROM l, ld""".stripMargin,
    // per-key count-of-counts replayed with the same integer ceil
    "q159_skew_advisor" -> {
      def card(name: String, table: String, key: String) =
        s"""SELECT '$name' AS key_col,
           |  CAST(sum(c) AS BIGINT) AS n_rows,
           |  CAST(count(*) AS BIGINT) AS n_keys,
           |  max(c) AS max_per_key,
           |  CAST((1000000 * max(c)) // sum(c) AS BIGINT) AS top_share_ppm,
           |  CAST((max(c) * count(*) + sum(c) - 1) // sum(c) AS BIGINT)
           |    AS salt_factor
           |FROM (SELECT CAST(count(*) AS BIGINT) AS c
           |  FROM $table GROUP BY $key)""".stripMargin
      Seq(card("lineitem.l_orderkey", "lineitem", "l_orderkey"),
        card("lineitem.l_suppkey", "lineitem", "l_suppkey"),
        card("orders.o_custkey", "orders", "o_custkey"),
        card("events.user_id", "events", "user_id"))
        .mkString("\nUNION ALL\n")
    },
    // both count-frame products replayed in HUGEINT: shared keys,
    // the exact Σ cA·cB output identity, blowup vs the larger input,
    // and the heaviest key's share
    "q305_join_preflight" -> {
      def card(name: String, aTable: String, aKey: String,
          bTable: String, bKey: String) =
        s"""SELECT '$name' AS join_name,
           |  (SELECT CAST(count(*) AS BIGINT) FROM $aTable) AS n_left,
           |  (SELECT CAST(count(*) AS BIGINT) FROM $bTable) AS n_right,
           |  CAST(count(*) AS BIGINT) AS n_shared_keys,
           |  CAST(coalesce(sum(p), 0) AS BIGINT) AS predicted_rows,
           |  CAST(coalesce(sum(p), 0) * 1000000 // greatest(
           |    (SELECT count(*) FROM $aTable),
           |    (SELECT count(*) FROM $bTable)) AS BIGINT) AS blowup_ppm,
           |  CAST(coalesce(max(p), 0) AS BIGINT) AS top_key_rows,
           |  CAST(CASE WHEN coalesce(sum(p), 0) > 0
           |    THEN coalesce(max(p), 0) * 1000000 // sum(p)
           |    ELSE 0 END AS BIGINT) AS top_key_share_ppm
           |FROM (SELECT CAST(ca.c AS HUGEINT) * cb.c AS p
           |  FROM (SELECT $aKey AS k, count(*) AS c FROM $aTable
           |    GROUP BY 1) ca
           |  JOIN (SELECT $bKey AS k, count(*) AS c FROM $bTable
           |    GROUP BY 1) cb USING (k))""".stripMargin
      Seq(card("lineitem_orders_on_orderkey",
          "lineitem", "l_orderkey", "orders", "o_orderkey"),
        card("lineitem_self_on_partkey",
          "lineitem", "l_partkey", "lineitem", "l_partkey"))
        .map(q => s"($q)").mkString("\nUNION ALL\n") +
        "\nORDER BY join_name"
    },
    // per-column stats replayed literally: null mass as count(*) -
    // count(col), distinct/min/max over the same fixed-point image
    // (floats through floor(x·100)) and the same second-resolution
    // timestamp rendering the Spark side uses
    "q165_benford" ->
      """WITH d AS (SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT)
        |    AS digit
        |  FROM (SELECT CAST(floor(o_totalprice * 100.0) AS BIGINT) AS c
        |    FROM orders) x WHERE c > 0),
        |g AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d
        |  GROUP BY digit),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM g),
        |e AS (SELECT * FROM (VALUES (1, 301029), (2, 176091), (3, 124938),
        |    (4, 96910), (5, 79181), (6, 66946), (7, 57991), (8, 51152),
        |    (9, 45757)) v(digit, benford_ppm))
        |SELECT g.digit, g.n,
        |  CAST(g.n * 1000000 // t.t AS BIGINT) AS observed_ppm,
        |  CAST(e.benford_ppm AS BIGINT) AS benford_ppm,
        |  CAST(abs(g.n * 1000000 // t.t - e.benford_ppm) AS BIGINT)
        |    AS deviation_ppm
        |FROM g JOIN e ON g.digit = e.digit, t
        |ORDER BY g.digit""".stripMargin,
    "q162_k_anonymity" ->
      """WITH cls AS (SELECT c_mktsegment, c_nationkey,
        |    CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
        |    CAST(count(*) AS BIGINT) AS cls_n
        |  FROM customer GROUP BY c_mktsegment, c_nationkey,
        |    CAST(floor(c_acctbal / 1000.0) AS BIGINT))
        |SELECT c_mktsegment,
        |  CAST(sum(cls_n) AS BIGINT) AS n_rows,
        |  CAST(count(*) AS BIGINT) AS n_classes,
        |  CAST(min(cls_n) AS BIGINT) AS k_min,
        |  CAST(sum(CASE WHEN cls_n < 5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_risky_classes,
        |  CAST(sum(CASE WHEN cls_n < 5 THEN cls_n ELSE 0 END) AS BIGINT)
        |    AS n_risky_rows
        |FROM cls GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q156_column_profile" -> {
      def numCol(c: String) =
        s"""SELECT '$c' AS column_name,
           |  CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  CAST(min($c) AS VARCHAR) AS min_s,
           |  CAST(max($c) AS VARCHAR) AS max_s FROM orders""".stripMargin
      def fpCol(c: String) =
        s"""SELECT '$c',
           |  CAST(count(*) - count($c) AS BIGINT),
           |  CAST(count(DISTINCT CAST(floor($c * 100) AS BIGINT)) AS BIGINT),
           |  CAST(min(CAST(floor($c * 100) AS BIGINT)) AS VARCHAR),
           |  CAST(max(CAST(floor($c * 100) AS BIGINT)) AS VARCHAR) FROM orders""".stripMargin
      def tsCol(c: String) =
        s"""SELECT '$c',
           |  CAST(count(*) - count($c) AS BIGINT),
           |  CAST(count(DISTINCT $c) AS BIGINT),
           |  strftime(min($c), '%Y-%m-%d %H:%M:%S'),
           |  strftime(max($c), '%Y-%m-%d %H:%M:%S') FROM orders""".stripMargin
      Seq(numCol("o_orderkey"), numCol("o_custkey"), numCol("o_orderstatus"),
        fpCol("o_totalprice"), tsCol("o_orderdate"), numCol("o_orderpriority"))
        .mkString("\nUNION ALL\n")
    },
    // the dense hour × type grid with explicit zeros; null-safe on the
    // null-timestamp hour row
    "q132_unpivot" ->
      """WITH p AS (SELECT date_trunc('hour', ts) AS hour_ts, event_type,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |h AS (SELECT DISTINCT hour_ts FROM p),
        |t(event_type) AS (VALUES ('view'), ('click'), ('purchase'),
        |  ('signup'), ('error'))
        |SELECT h.hour_ts, t.event_type, coalesce(p.n, 0) AS n
        |FROM h CROSS JOIN t
        |LEFT JOIN p ON h.hour_ts IS NOT DISTINCT FROM p.hour_ts
        |  AND t.event_type = p.event_type""".stripMargin,
    // the PLAIN join — equality certifies salting is semantics-free
    "q133_salted_join" ->
      """SELECT s_nationkey, count(*) AS n_items,
        | CAST(sum(CAST(floor(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT)
        |   AS total_cents
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey""".stripMargin,
    // both rule directions from the same pair frame; HUGEINT carries
    // the confidence and lift numerators
    "q134_assoc_rules" ->
      s"""WITH it AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         |nn AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n FROM it),
         |c AS (SELECT pk, CAST(count(*) AS BIGINT) AS c FROM it GROUP BY pk),
         |p AS (SELECT a.pk AS a, b.pk AS b, CAST(count(*) AS BIGINT) AS support
         |  FROM it a JOIN it b ON a.ok = b.ok AND a.pk < b.pk
         |  GROUP BY 1, 2 HAVING count(*) >= $MinRuleSupport),
         |r AS (SELECT a AS antecedent, b AS consequent, support FROM p
         |  UNION ALL SELECT b, a, support FROM p)
         |SELECT antecedent, consequent, support,
         |  CAST((CAST(support AS HUGEINT) * 1000000) // ca.c AS BIGINT)
         |    AS conf_ppm,
         |  CAST((CAST(support AS HUGEINT) * (SELECT n FROM nn) * 1000000)
         |    // (ca.c * cb.c) AS BIGINT) AS lift_ppm
         |FROM r JOIN c ca ON r.antecedent = ca.pk
         |JOIN c cb ON r.consequent = cb.pk""".stripMargin,
    // same pair counting and top-k order; HUGEINT carries the lift
    "q124_itemsets" ->
      s"""WITH it AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         |nn AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n FROM it),
         |c AS (SELECT pk, CAST(count(*) AS BIGINT) AS c FROM it GROUP BY pk),
         |p AS (SELECT a.pk AS item_a, b.pk AS item_b, CAST(count(*) AS BIGINT) AS support
         |  FROM it a JOIN it b ON a.ok = b.ok AND a.pk < b.pk GROUP BY 1, 2),
         |t AS (SELECT * FROM p ORDER BY support DESC, item_a, item_b LIMIT $BasketTopK)
         |SELECT item_a, item_b, support,
         |  CAST((CAST(support AS HUGEINT) * (SELECT n FROM nn) * 1000000)
         |    // (ca.c * cb.c) AS BIGINT) AS lift_ppm
         |FROM t JOIN c ca ON t.item_a = ca.pk JOIN c cb ON t.item_b = cb.pk""".stripMargin,
    // dominance spelled as NOT EXISTS — deliberately independent of the
    // Spark plan's per-size aggregation, so the frontier algebra itself
    // is what the hash compare proves
    "q118_skyline" ->
      """WITH p AS (SELECT p_partkey, CAST(p_size AS BIGINT) AS size,
        |    CAST(floor(p_retailprice * 100.0) AS BIGINT) AS price_cents
        |  FROM part)
        |SELECT p_partkey, size, price_cents FROM p
        |WHERE NOT EXISTS (SELECT 1 FROM p q
        |  WHERE q.size >= p.size AND q.price_cents <= p.price_cents
        |    AND (q.size > p.size OR q.price_cents < p.price_cents))""".stripMargin,
    // GROUPING(a, b) carries the same first-arg-is-MSB convention as
    // Spark's grouping_id()
    "q119_cube_grouping" ->
      """SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
        | o_orderpriority,
        | CAST(GROUPING(CAST(EXTRACT(year FROM o_orderdate) AS BIGINT),
        |   o_orderpriority) AS BIGINT) AS gid,
        | count(*) AS n_orders,
        | CAST(sum(CAST(floor(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM orders
        |GROUP BY CUBE(CAST(EXTRACT(year FROM o_orderdate) AS BIGINT), o_orderpriority)""".stripMargin,
    // the identical interleave terms, generated by the same function
    "q120_zorder_audit" -> {
      val zSql = graft.layout.ZOrder.zExprSql("x", "y", ZBits, "//")
      s"""WITH d AS (SELECT CAST(o_custkey % $ZMask AS BIGINT) AS x,
         |    CAST(datediff('day', DATE '1970-01-01', o_orderdate) % $ZMask AS BIGINT) AS y
         |  FROM orders),
         |z AS (SELECT x, y, $zSql AS z FROM d)
         |SELECT CAST(z // $ZBucketSize AS BIGINT) AS zbucket, count(*) AS n,
         |  min(x) AS x_min, max(x) AS x_max, min(y) AS y_min, max(y) AS y_max
         |FROM z GROUP BY 1""".stripMargin
    },
    // each FK edge replayed as a NOT-IN-parents filter + counts
    "q149_fk_audit" ->
      """SELECT 'lineitem->orders' AS fk,
        |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_child,
        |  CAST(count(*) AS BIGINT) AS n_orphans,
        |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orphan_keys
        |FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
        |UNION ALL
        |SELECT 'lineitem->supplier',
        |  (SELECT count(*) FROM lineitem), count(*), count(DISTINCT l_suppkey)
        |FROM lineitem WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier)
        |UNION ALL
        |SELECT 'orders->customer',
        |  (SELECT count(*) FROM orders), count(*), count(DISTINCT o_custkey)
        |FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
        |UNION ALL
        |SELECT 'customer->nation',
        |  (SELECT count(*) FROM customer), count(*), count(DISTINCT c_nationkey)
        |FROM customer WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation)
        |UNION ALL
        |SELECT 'supplier->nation',
        |  (SELECT count(*) FROM supplier), count(*), count(DISTINCT s_nationkey)
        |FROM supplier WHERE s_nationkey NOT IN (SELECT n_nationkey FROM nation)""".stripMargin,
    // q11's gap rule + per-session rank + string_agg + top-k replay
    "q148_session_paths" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |    epoch_ns(ts) // 1000 AS us FROM events),
        |s AS (SELECT user_id, event_id, event_type, us,
        |    CASE WHEN lag(us) OVER w IS NULL
        |      OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |t AS (SELECT user_id, event_id, event_type, us,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS UNBOUNDED PRECEDING) AS sess_no FROM s),
        |r AS (SELECT user_id, sess_no, event_type,
        |    row_number() OVER (PARTITION BY user_id, sess_no
        |      ORDER BY us, event_id) AS rn FROM t),
        |p AS (SELECT user_id, sess_no,
        |    string_agg(event_type, '>' ORDER BY rn) AS path
        |  FROM r WHERE rn <= 5 GROUP BY 1, 2),
        |g AS (SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
        |  FROM p GROUP BY path),
        |k AS (SELECT path, n_sessions, row_number() OVER (
        |    ORDER BY n_sessions DESC, path) AS rn FROM g)
        |SELECT path, n_sessions, CAST(rn AS BIGINT) AS rn
        |FROM k WHERE rn <= 15""".stripMargin,
    // the q40 ceil-rank cutoff convention over the counting aggregate,
    // then clip + re-aggregate — clip counts included
    "q145_winsorize" ->
      """WITH v AS (SELECT event_type,
        |    CAST(floor(value * 10000.0) AS BIGINT) AS v_fp
        |  FROM events WHERE value IS NOT NULL),
        |c AS (SELECT event_type, v_fp, count(*) AS c FROM v GROUP BY 1, 2),
        |cm AS (SELECT event_type, v_fp,
        |    sum(c) OVER (PARTITION BY event_type ORDER BY v_fp) AS cum,
        |    sum(c) OVER (PARTITION BY event_type) AS n FROM c),
        |cuts AS (SELECT event_type,
        |    min(CASE WHEN cum >= CAST(ceil(0.05 * n) AS BIGINT)
        |      THEN v_fp END) AS lo_fp,
        |    min(CASE WHEN cum >= CAST(ceil(0.95 * n) AS BIGINT)
        |      THEN v_fp END) AS hi_fp
        |  FROM cm GROUP BY 1)
        |SELECT v.event_type, count(*) AS n,
        |  min(lo_fp) AS lo_fp, min(hi_fp) AS hi_fp,
        |  CAST(sum(CASE WHEN v_fp < lo_fp THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clip_low,
        |  CAST(sum(CASE WHEN v_fp > hi_fp THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clip_high,
        |  CAST(sum(greatest(least(v_fp, hi_fp), lo_fp)) AS BIGINT)
        |    AS winsorized_sum_fp
        |FROM v JOIN cuts USING (event_type) GROUP BY v.event_type""".stripMargin,
    // same integer day axis, same RANGE frame, same cent floor
    "q114_rolling_spend" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(datediff('day', DATE '1970-01-01', o_orderdate) AS BIGINT) AS order_day,
        |  CAST(count(*) OVER w AS BIGINT) AS n_90d,
        |  CAST(sum(CAST(floor(o_totalprice * 100.0) AS BIGINT)) OVER w AS BIGINT)
        |    AS spend_90d_cents
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY datediff('day', DATE '1970-01-01', o_orderdate)
        |  RANGE BETWEEN 90 PRECEDING AND CURRENT ROW)""".stripMargin,
    // conditional counts mirror the explicit-values pivot; absent
    // cells are 0, not null
    "q109_event_pivot" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_ts,
        |  CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS n_view,
        |  CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
        |  CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase,
        |  CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS n_signup,
        |  CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS n_error
        |FROM events GROUP BY 1""".stripMargin,
    "q93_snapshot_diff" ->
      """WITH o AS (SELECT * FROM supplier),
        |n AS (SELECT s_suppkey, s_name, s_nationkey,
        |    CASE WHEN s_suppkey % 7 = 0 THEN s_acctbal + 10.0
        |      ELSE s_acctbal END AS s_acctbal
        |  FROM supplier WHERE s_suppkey % 13 <> 0
        |  UNION ALL
        |  SELECT s_suppkey + 100000, s_name, s_nationkey, s_acctbal
        |  FROM supplier WHERE s_suppkey % 11 = 0)
        |SELECT coalesce(o.s_suppkey, n.s_suppkey) AS s_suppkey,
        |  CASE WHEN o.s_suppkey IS NULL THEN 'insert'
        |    WHEN n.s_suppkey IS NULL THEN 'delete'
        |    WHEN o.s_name IS NOT DISTINCT FROM n.s_name
        |      AND o.s_nationkey IS NOT DISTINCT FROM n.s_nationkey
        |      AND o.s_acctbal IS NOT DISTINCT FROM n.s_acctbal THEN 'unchanged'
        |    ELSE 'update' END AS change
        |FROM o FULL OUTER JOIN n ON o.s_suppkey = n.s_suppkey""".stripMargin,
    "q94_scd2_apply" ->
      """WITH o AS (SELECT * FROM supplier),
        |n AS (SELECT s_suppkey, s_name, s_nationkey,
        |    CASE WHEN s_suppkey % 7 = 0 THEN s_acctbal + 10.0
        |      ELSE s_acctbal END AS s_acctbal
        |  FROM supplier WHERE s_suppkey % 13 <> 0
        |  UNION ALL
        |  SELECT s_suppkey + 100000, s_name, s_nationkey, s_acctbal
        |  FROM supplier WHERE s_suppkey % 11 = 0),
        |ch AS (SELECT coalesce(o.s_suppkey, n.s_suppkey) AS k,
        |  CASE WHEN o.s_suppkey IS NULL THEN 'insert'
        |    WHEN n.s_suppkey IS NULL THEN 'delete'
        |    WHEN o.s_name IS NOT DISTINCT FROM n.s_name
        |      AND o.s_nationkey IS NOT DISTINCT FROM n.s_nationkey
        |      AND o.s_acctbal IS NOT DISTINCT FROM n.s_acctbal THEN 'unchanged'
        |    ELSE 'update' END AS change
        |  FROM o FULL OUTER JOIN n ON o.s_suppkey = n.s_suppkey)
        |SELECT o.*, CAST(0 AS BIGINT) AS valid_from, CAST(100 AS BIGINT) AS valid_to
        |  FROM o JOIN ch ON o.s_suppkey = ch.k WHERE ch.change IN ('delete', 'update')
        |UNION ALL
        |SELECT o.*, CAST(0 AS BIGINT), CAST(NULL AS BIGINT)
        |  FROM o JOIN ch ON o.s_suppkey = ch.k WHERE ch.change = 'unchanged'
        |UNION ALL
        |SELECT n.*, CAST(100 AS BIGINT), CAST(NULL AS BIGINT)
        |  FROM n JOIN ch ON n.s_suppkey = ch.k WHERE ch.change IN ('insert', 'update')""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | sum(l_quantity) AS sum_qty,
        | CAST(sum(CAST(floor(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT) AS sum_base_cents,
        | CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000.0) AS BIGINT)) AS BIGINT) AS sum_disc_fp,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_top_orders" ->
      """SELECT o_orderkey, o_orderpriority, revenue_fp
        |FROM orders JOIN (
        |  SELECT l_orderkey,
        |    CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000.0) AS BIGINT)) AS BIGINT) AS revenue_fp
        |  FROM lineitem GROUP BY l_orderkey) r ON o_orderkey = r.l_orderkey
        |ORDER BY revenue_fp DESC, o_orderkey LIMIT 10""".stripMargin,
    "q3_nation_revenue" ->
      """SELECT n_name, r_name,
        | CAST(sum(CAST(floor(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS total_cents,
        | count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY n_name, r_name ORDER BY n_name""".stripMargin,
    "q4_priority_semi" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q5_window_topk" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3""".stripMargin,
    "q6_filtered_revenue" ->
      """SELECT
        | CAST(sum(CAST(floor(l_extendedprice * l_discount * 10000.0) AS BIGINT)) AS BIGINT) AS revenue_fp,
        | count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.03 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q7_distinct_counts" ->
      """SELECT l_returnflag,
        | count(DISTINCT l_partkey) AS n_parts,
        | count(DISTINCT l_suppkey) AS n_supps,
        | count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q8_customers_no_orders" ->
      """SELECT * FROM (
        |  SELECT c_custkey FROM customer
        |  EXCEPT
        |  SELECT o_custkey AS c_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00') t""".stripMargin,
    "q9_events_hourly" ->
      """SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_ts,
        | count(*) AS n_events,
        | CAST(sum(CAST(floor(value * 10000.0) AS BIGINT)) AS BIGINT) AS sum_value_fp
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q10_brand_stats" ->
      """SELECT p_brand, count(*) AS n_parts,
        | min(p_retailprice) AS min_price,
        | max(p_retailprice) AS max_price,
        | CAST(sum(CAST(floor(p_retailprice * 100.0) AS BIGINT)) AS DOUBLE) / 100.0
        |   / CAST(count(*) AS DOUBLE) AS avg_price
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q11_sessions" ->
      """SELECT user_id,
        | CAST(sum(new_sess) AS BIGINT) AS n_sessions,
        | count(*) AS n_events
        |FROM (
        |  SELECT user_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR (epoch_ns(ts) // 1000) - (epoch_ns(lag(ts) OVER w) // 1000)
        |         > 1800000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) t
        |GROUP BY user_id""".stripMargin,
    "q12_year_priority_rollup" ->
      """SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
        | o_orderpriority, count(*) AS n_orders,
        | CAST(sum(CAST(floor(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM orders
        |GROUP BY ROLLUP(o_year, o_orderpriority)
        |ORDER BY o_year ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q13_part_type_revenue" ->
      """SELECT p_type, count(*) AS n_items,
        | CAST(sum(CAST(floor(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_type ORDER BY p_type""".stripMargin,
    "q25_left_join_tags" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        | count(tag_fp) AS n_tagged,
        | CAST(sum(coalesce(tag_fp, 0)) AS BIGINT) AS sum_tag
        |FROM lineitem L LEFT JOIN (
        |  SELECT l_orderkey AS k1, l_partkey AS k2, l_suppkey AS k3,
        |    l_linenumber AS k4,
        |    CAST(floor(l_extendedprice * 100.0) AS BIGINT) AS tag_fp
        |  FROM lineitem WHERE l_quantity > 48) T
        | ON L.l_orderkey = T.k1 AND L.l_partkey = T.k2
        |  AND L.l_suppkey = T.k3 AND L.l_linenumber = T.k4
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q30_props_json" ->
      """SELECT event_type, count(*) AS n_events,
        | CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        | CAST(min(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
        | CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q33_supplier_revenue" ->
      """SELECT n_name,
        | count(DISTINCT s_suppkey) AS n_suppliers,
        | count(*) AS n_items,
        | CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000.0) AS BIGINT)) AS BIGINT) AS revenue_fp
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
  )
}
