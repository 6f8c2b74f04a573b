package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic exact-k-per-group sampling — eval-set selection that
  * is reproducible across engines, retries and partitionings: each
  * group keeps the k rows with the smallest md5(key), an order every
  * engine computes identically (unlike rand()/sampleBy).
  *
  * The naive formulation — row_number over a per-group window ordered
  * by hash — sorts each group's ENTIRE corpus slice in one task (the
  * q40-style scale-killer). This is the threshold-prefilter form:
  *
  *   1. per-group row counts (aggregation, scale-safe);
  *   2. a conservative hash threshold per group,
  *      `T = margin · k/n · 2^32` (broadcast-joined back): only rows
  *      whose 32-bit hash prefix falls below T survive — in
  *      expectation `margin · k` rows per group, bounded by the margin
  *      and k, NOT by corpus size. Groups with ≤ margin·k rows skip
  *      the filter entirely (exactness is trivial there);
  *   3. the rank window runs over the surviving sliver only.
  *
  * The threshold is probabilistic, so step 3 VERIFIES it: if a group's
  * survivor count is below min(k, n) — including ZERO survivors, which
  * a survivors-only aggregation would miss — the k-th smallest hash
  * might lie above T and the sample would be silently wrong; the
  * operator fails loudly instead (raise `margin`; the default gives a
  * comfortable tail for uniform md5 prefixes). At 100 TB the failure
  * path is a driver-side re-run with a wider margin, the standard
  * two-phase exact-selection trade.
  *
  * Rows with a null `keyCol` are excluded from counts and sample alike
  * (no hash → no deterministic position).
  *
  * NOTE: construction is NOT free — the exactness guard runs eager
  * Spark jobs (the count + survivor-count compare) before the lazy
  * result DataFrame is returned, unlike most operators here. The
  * survivor sliver those jobs materialize is persisted and reused by
  * the returned plan, so the work is not wasted — but callers
  * scheduling plan construction on a latency-sensitive thread should
  * know two jobs run inside this call.
  */
object Sampling {

  /** 32-bit integer prefix of md5(key) — uniform on [0, 2^32). */
  private[graft] def hash32(keyCol: String): org.apache.spark.sql.Column =
    expr(s"cast(conv(substr(md5(cast(${graft.Names.quoted(keyCol)} as string)), 1, 8), 16, 10) as bigint)")

  def deterministicGroupSample(df: DataFrame, groupCol: String, keyCol: String,
      k: Int, margin: Int = 8): DataFrame = {
    require(k > 0 && margin >= 2, "k must be positive, margin >= 2")
    // caller-supplied names are quoted wherever they hit a parsed
    // context (expr/col) — dotted names must not resolve as field
    // access; join(usingColumns) takes the RAW name
    val qg = graft.Names.quoted(groupCol)
    val qk = graft.Names.quoted(keyCol)
    val h = graft.Names.fresh("_h", df.columns)
    val n = graft.Names.fresh("_n", df.columns)
    val t = graft.Names.fresh("_t", df.columns)
    val rn = graft.Names.fresh("_rn", df.columns)
    // a null key has no hash and therefore no deterministic sample
    // position — null-key rows are excluded from BOTH the counts and
    // the sample (otherwise they'd inflate n and make the exactness
    // guard unsatisfiable for small groups)
    val hashed = df.withColumn(h, hash32(keyCol)).filter(col(h).isNotNull)
    val counts = hashed.groupBy(col(qg)).agg(count(lit(1)).as(n))
      .withColumn(t,
        when(col(n) <= k.toLong * margin, lit(1L << 32)) // small group: keep all
          .otherwise(expr(s"cast(${k.toLong * margin} * 4294967296.0 / `$n` as bigint)")))
    // persisted (Caches-tracked): the guard action below and the
    // returned plan both consume the sliver; it is BOUNDED at
    // ~margin·k rows per group, so the cache is tiny regardless of
    // corpus size, and without it the corpus scan would run twice
    val survivors = Caches.persistTracked(hashed
      .join(broadcast(counts), groupCol)
      .filter(col(h) < col(t)))
    // exactness guard: every group must retain at least min(k, n)
    // survivors, else the threshold clipped the true top-k. Counted by
    // LEFT JOIN from the full group list — aggregating over survivors
    // alone would make a zero-survivor group invisible to the check
    // and silently drop it from the sample
    val surv = graft.Names.fresh("_surv", df.columns ++ Seq(h, n, t, rn))
    val short = counts
      .join(survivors.groupBy(col(qg)).agg(count(lit(1)).as(surv)),
        Seq(groupCol), "left")
      .filter(coalesce(col(surv), lit(0L)) < least(lit(k.toLong), col(n)))
      .limit(1).collect()
    require(short.isEmpty,
      s"deterministicGroupSample: margin=$margin too tight for group " +
        s"'${short.headOption.map(_.get(0)).orNull}' — raise margin")
    val w = Window.partitionBy(col(qg)).orderBy(col(h), col(qk))
    survivors.withColumn(rn, row_number().over(w))
      .filter(col(rn) <= k)
      .drop(h, n, t, rn)
  }

  /** Weighted deterministic top-k per group: each row draws the
    * integer priority `⌊h·10⁶ / w⌋` (h = 32-bit md5 prefix of the
    * key, w = positive weight) and the k smallest priorities per
    * group win — heavier rows draw proportionally smaller priorities,
    * so the sample is weight-biased yet a pure function of the data
    * (the weighted counterpart of [[deterministicGroupSample]]; the
    * contract IS the integer priority formula, not an exact A-ES
    * distribution — no float pow crosses an engine boundary).
    *
    * Scale shape mirrors q52's threshold prefilter, lifted to
    * PRIORITY space: survival is `pri < C` with
    * `C = (k·margin·2³²·10⁶) div Σw` — constant within the group, so
    * survival is exactly monotone in priority and expected survivors
    * stay ≤ k·margin regardless of group size (E[rows with pri < C] =
    * Σ min(1, k·margin·wᵢ/Σw)). The rank window sorts only that
    * sliver. Small groups (n ≤ k·margin) keep every row; the q52
    * exactness guard fails loudly if weight skew starves a group's
    * sliver below min(k, n). Null keys, null weights and w ≤ 0 rows
    * are excluded throughout (no hash → no position).
    *
    * Returns the surviving rows' original columns plus `_priority`.
    * Same eager-jobs caveat as [[deterministicGroupSample]]. */
  def weightedGroupSample(df: DataFrame, groupCol: String, keyCol: String,
      weightCol: String, k: Int, margin: Int = 8): DataFrame = {
    require(k > 0 && margin >= 2, "k must be positive, margin >= 2")
    require(!df.columns.contains("_priority"),
      "input already has a _priority column")
    val qg = graft.Names.quoted(groupCol)
    val qw = graft.Names.quoted(weightCol)
    val h = graft.Names.fresh("_h", df.columns)
    val n = graft.Names.fresh("_n", df.columns)
    val sw = graft.Names.fresh("_sw", df.columns)
    val t = graft.Names.fresh("_t", df.columns)
    val rn = graft.Names.fresh("_rn", df.columns)
    val maxPri = 4294967296L * 1000000L // beyond any real priority → keep all
    val hashed = df.withColumn(h, hash32(keyCol))
      .filter(col(h).isNotNull && col(qw).isNotNull && col(qw) > 0)
      .withColumn("_priority", expr(s"(`$h` * 1000000L) div $qw"))
    val counts = hashed.groupBy(col(qg))
      .agg(count(lit(1)).as(n),
        sum(col(qw).cast("decimal(38,0)")).as(sw))
      .withColumn(t,
        when(col(n) <= k.toLong * margin, lit(maxPri))
          .otherwise(least(
            floor(lit(k.toLong * margin).cast("decimal(38,0)") *
              lit(4294967296L) * lit(1000000L) / col(sw)).cast("bigint"),
            lit(maxPri))))
    val survivors = Caches.persistTracked(hashed
      .join(broadcast(counts), groupCol)
      .filter(col("_priority") < col(t)))
    val surv = graft.Names.fresh("_surv", df.columns ++ Seq(h, n, sw, t, rn))
    val short = counts
      .join(survivors.groupBy(col(qg)).agg(count(lit(1)).as(surv)),
        Seq(groupCol), "left")
      .filter(coalesce(col(surv), lit(0L)) < least(lit(k.toLong), col(n)))
      .limit(1).collect()
    require(short.isEmpty,
      s"weightedGroupSample: margin=$margin too tight for group " +
        s"'${short.headOption.map(_.get(0)).orNull}' — raise margin")
    val w = Window.partitionBy(col(qg))
      .orderBy(col("_priority"), col(graft.Names.quoted(keyCol)))
    survivors.withColumn(rn, row_number().over(w))
      .filter(col(rn) <= k)
      .drop(h, n, sw, t, rn)
  }

  /** Deterministic token-budget mixture sampling — the "data mixing"
    * step of a training pipeline: given a per-stratum target weight
    * (DoReMi-style static reweighting) and a total token budget
    * expressed as a fraction of the corpus, derive each stratum's
    * keep-rate
    *
    *   rate_s = min(1, (w_s/ΣW) · (budgetFraction·ΣT) / n_s)
    *
    * (n_s = stratum token count) and keep the rows whose 32-bit md5
    * key prefix falls under rate_s·2³² — a pure function of the data,
    * so the SAME rows are selected by any engine, any partitioning,
    * any retry, and the selection composes with downstream dedup
    * without coordination.
    *
    * Scale shape: one token-count aggregation per stratum (strata are
    * few — sources/languages), a single-row total, rates
    * broadcast-joined back; the selection itself is scan-local (no
    * shuffle of the corpus). The float arithmetic is a fixed
    * left-associative expression tree replayed verbatim by the DuckDB
    * oracle — IEEE ops are bit-identical across engines.
    *
    * `weightExpr` must be a deterministic function of `stratumCol`
    * (it is evaluated on the aggregated stratum rows), and every
    * stratum's weight must be a positive number — validated with an
    * eager job over the (tiny) stratum counts, because an all-zero
    * weight vector would make every rate 0/0 = NaN, `least(1, NaN)`
    * = 1, and a 30% budget would silently return 100% of the corpus.
    *
    * Rows with a null stratum or null key are EXCLUDED from the token
    * mass as well as the output (same contract as
    * [[deterministicGroupSample]]'s null keys): a null key can never
    * be selected (its hash is null), so counting its tokens would make
    * every realized rate silently undershoot the target. */
  def tokenBudgetMixture(df: DataFrame, stratumCol: String, keyCol: String,
      tokenCol: String, weightExpr: org.apache.spark.sql.Column,
      budgetFraction: Double): DataFrame = {
    require(budgetFraction > 0.0 && budgetFraction <= 1.0,
      "budgetFraction must be in (0, 1]")
    val qs = graft.Names.quoted(stratumCol)
    val qk = graft.Names.quoted(keyCol)
    val qt = graft.Names.quoted(tokenCol)
    val taken = df.columns
    val n = graft.Names.fresh("_n", taken)
    val w = graft.Names.fresh("_w", taken)
    val tn = graft.Names.fresh("_tn", taken)
    val tw = graft.Names.fresh("_tw", taken)
    val th = graft.Names.fresh("_th", taken)
    val h = graft.Names.fresh("_hx", taken)
    val eligible = df.filter(col(qs).isNotNull && col(qk).isNotNull)
    // persisted (Caches-tracked): the weight guard, the rates branch
    // AND the totals branch all derive from the per-stratum counts,
    // and without materialization Spark re-runs the corpus
    // tokenize+aggregate for each — the frame is #strata rows, so the
    // cache is trivial and saves two full corpus scans
    val counts = Caches.persistTracked(
      eligible.groupBy(col(qs)).agg(sum(col(qt)).as(n)).withColumn(w, weightExpr))
    val badWeight = counts
      .filter(col(w).isNull || col(w).cast("double") <= 0.0)
      .limit(1).collect()
    require(badWeight.isEmpty,
      s"tokenBudgetMixture: weightExpr must be positive for every stratum — " +
        s"stratum '${badWeight.headOption.map(_.get(0)).orNull}' got " +
        s"'${badWeight.headOption.map(_.get(badWeight.head.length - 1)).orNull}'")
    val tot = counts.agg(sum(col(n)).as(tn), sum(col(w)).as(tw))
    // ((w/ΣW) · (bf·ΣT)) / n — keep this exact tree: the oracle replays
    // it literally, and IEEE doubles only match if the ops match
    val rate = least(lit(1.0),
      (col(w).cast("double") / col(tw).cast("double")) *
        (lit(budgetFraction) * col(tn).cast("double")) / col(n).cast("double"))
    // floor, not cast: Spark's double→long cast truncates while
    // DuckDB's rounds — floor agrees everywhere for non-negative rates
    val rates = counts.crossJoin(broadcast(tot))
      .withColumn(th, floor(rate * lit(4294967296.0)).cast("long"))
      .select(col(qs), col(th))
    eligible.join(broadcast(rates), Seq(stratumCol))
      .withColumn(h, hash32(keyCol))
      .filter(col(h) < col(th))
      .drop(h, th)
  }

  /** Deterministic train/val/test assignment by key hash: the split a
    * training pipeline must be able to RE-DERIVE forever (reshuffling
    * the corpus, appending batches, or re-running the job must never
    * move a document across splits, or eval contaminates). The
    * assignment is a pure row-local function of the key — hash32 mod
    * 100 against cumulative percent fences — so it holds under any
    * partitioning, needs zero shuffle, and replays in SQL. Splits are
    * disjoint and exhaustive by construction. */
  def hashSplit(df: DataFrame, keyCol: String, trainPct: Int,
      valPct: Int): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      "percents must leave room for a non-empty test split")
    val r = graft.Names.fresh("_r", df.columns)
    df.withColumn(r, hash32(keyCol) % 100)
      .withColumn("split",
        when(col(r) < trainPct, "train")
          .when(col(r) < trainPct + valPct, "val")
          .otherwise("test"))
      .drop(r)
  }

  /** Deterministic shard plan — the (shard, position) assignment a
    * resumable training data-loader needs: shard = hash32(key) mod
    * nShards, position = rank of (hash, key) within the shard. Both
    * are pure functions of the key set, so the plan re-derives
    * identically after reshuffles, retries, or re-runs — reading
    * shard s from position p resumes EXACTLY where a crashed epoch
    * stopped. Hash order also decorrelates neighbors, giving the
    * within-shard shuffle training wants without an RNG.
    *
    * Scale shape: one hash-shuffle on the shard key, then a
    * row_number window per shard — each shard sorts in ONE task, so
    * `nShards` is the parallelism/size knob: pick it so a shard fits
    * a task (at 100 TB that is ~10⁵ shards of ~1 GB, the same
    * file-count a sharded writer would emit). Null keys are excluded
    * (no hash → no deterministic position).
    *
    * PRECONDITION: `keyCol` values must be UNIQUE — the key IS the
    * row's identity. Duplicate keys collide on the (hash, key) sort
    * tuple, making their relative positions partition-order-dependent
    * and breaking the re-derivability contract. */
  def shardPlan(df: DataFrame, keyCol: String, nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    // `shard`/`pos` are the operator's output contract — fail loudly
    // rather than silently replace a caller's column
    require(!df.columns.contains("shard") && !df.columns.contains("pos"),
      "shardPlan reserves the output column names 'shard' and 'pos'")
    val qk = graft.Names.quoted(keyCol)
    val h = graft.Names.fresh("_h", df.columns)
    val qh = graft.Names.quoted(h)
    df.filter(col(qk).isNotNull)
      .withColumn(h, hash32(keyCol))
      .withColumn("shard", col(qh) % nShards)
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard"))
          .orderBy(col(qh), col(qk))).cast("bigint"))
      .drop(h)
  }

  /** Deterministic mixture-preserving batch schedule — the read ORDER
    * a training data-loader needs so every batch replays the corpus's
    * source mix: [[shardPlan]] fixes WHERE a doc lives and its resume
    * position, but hash order alone lets a batch go all-one-source by
    * chance, and mixture jitter between steps is gradient noise a
    * curriculum didn't ask for. The stride interleave fixes it
    * exactly: within a shard, doc r of a source holding nS of the
    * shard's N docs sits at slot ⌊(2r−1)·N / (2·nS)⌋ — each source's
    * docs land evenly every N/nS slots (the Bresenham line-drawing
    * rule) — and the shard's total order is (slot, source, key).
    * Every length-m prefix (so every batch) then holds each source to
    * within the simultaneous-tie bound (≲ one doc per source) of its
    * proportional share, spec-pinned on random fixtures.
    *
    * Determinism: ranks ride (md5-hash, key) like every split here, so
    * the schedule re-derives identically after reshuffles or re-runs —
    * and within a source the hash rank doubles as the within-shard
    * shuffle training wants. Scale shape: the [[shardPlan]] contract —
    * every window is shard-partitioned (one task per shard; `nShards`
    * is the parallelism knob), nothing global. Null keys are excluded
    * (no hash → no deterministic position); null sources schedule as
    * the "(null)" source.
    *
    * Output: the input key + `source, shard, pos, batch` (pos is
    * 1-based within the shard; batch = (pos−1) div batchSize). */
  def mixtureSchedule(df: DataFrame, srcCol: String, keyCol: String,
      nShards: Int, batchSize: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    require(batchSize > 0, "batchSize must be positive")
    Seq("source", "shard", "pos", "batch").foreach { c =>
      require(!df.columns.contains(c) || c == srcCol,
        s"mixtureSchedule reserves the output column name '$c'")
    }
    val qk = graft.Names.quoted(keyCol)
    val qs = graft.Names.quoted(srcCol)
    val h = graft.Names.fresh("_h", df.columns)
    val base = df.filter(col(qk).isNotNull)
      .select(col(qk).as("k"),
        coalesce(col(qs).cast("string"), lit("(null)")).as("source"))
      .withColumn(h, hash32("k"))
      .withColumn("shard", col(h) % nShards)
    val r = row_number().over(Window.partitionBy(col("shard"), col("source"))
      .orderBy(col(h), col("k"))).cast("bigint")
    val nS = count(lit(1)).over(Window.partitionBy(col("shard"), col("source")))
    val n = count(lit(1)).over(Window.partitionBy(col("shard")))
    val staged = base
      .withColumn("__r", r)
      .withColumn("__ns", nS.cast("bigint"))
      .withColumn("__n", n.cast("bigint"))
      .withColumn("__slot", expr("(2 * __r - 1) * __n div (2 * __ns)"))
    staged
      .withColumn("pos", row_number().over(Window.partitionBy(col("shard"))
        .orderBy(col("__slot"), col("source"), col("k"))).cast("bigint"))
      .withColumn("batch", expr(s"(pos - 1) div $batchSize"))
      .select(col("k").as(keyCol), col("source"), col("shard"),
        col("pos"), col("batch"))
  }

  /** Rendezvous (highest-random-weight) shard assignment — the
    * coordination-free complement of [[shardPlan]]'s `hash % N`:
    * every (key, shard) pair gets a deterministic md5 weight and the
    * key lives on the shard with the LARGEST weight. The property
    * that earns the extra hashing: growing N → N+1 moves ONLY the
    * keys whose new shard wins their argmax — an expected 1/(N+1) of
    * the data, and every mover lands on the NEW shard (Thaler &
    * Ravishankar 1996); `hash % N` reshuffles ~all of it. Entirely
    * row-local (one fold over the shard list per row — no shuffle,
    * no coordinator, any two engines agree), which is why object
    * stores and cache rings use exactly this. The weight is the md5
    * HEX STRING compared lexicographically — fixed-length lowercase
    * hex makes that identical to comparing the 128-bit value, and
    * both engines produce the same digest of the same bytes. */
  def rendezvousShard(keyCol: String, nShards: Int): org.apache.spark.sql.Column = {
    require(nShards > 0, "nShards must be positive")
    val k = graft.Names.quoted(keyCol)
    def w(x: String) = s"md5(concat(cast($k as string), ':', cast($x as string)))"
    // hash each (key, shard) weight ONCE: materialize the weights via
    // transform, then fold for the argmax — the CASE otherwise
    // re-evaluates the md5 in both its condition and its result arm,
    // doubling the per-row hash work of the hot path
    expr(s"""aggregate(
      transform(sequence(0, ${nShards - 1}),
        x -> named_struct('h', ${w("x")}, 's', x)),
      named_struct('h', cast('' as string), 's', cast(-1 as int)),
      (acc, e) -> CASE WHEN e.h > acc.h THEN e ELSE acc END).s""")
  }

  /** Capped-proportional (water-filling) budget allocation: split an
    * integer token `budget` equally across keys, except no key can
    * receive more than its `cap` — the classic fair-share rule a
    * training-data buyer runs when a target token count must be
    * spread across sources of unequal availability. Exact closed
    * form, no iteration: keys sorted by (cap asc, key asc) with
    * prefix sums; a key saturates iff even granting it its full cap
    * leaves every LARGER key at least that much
    * (`capᵢ·(n−i) + Pᵢ ≤ budget`); the rest share the remaining
    * budget at the floor level, with the division remainder granted
    * +1 token to the first `rem` unsaturated keys in sort order — so
    * `Σ alloc = min(budget, Σ cap)` EXACTLY, a property the specs
    * pin. For every unsaturated key `cap ≥ level + 1` holds by the
    * cut definition, so the +1 never breaches a cap.
    *
    * Determinism: pure integer arithmetic (floor division; the cut
    * and remainder are rank functions of the sorted caps), so the
    * whole allocation replays in SQL. Scale shape: runs on the
    * per-key AGGREGATE frame (≤ |keys| rows — metadata-sized), so
    * the global ordered window here is a deliberate single-task walk
    * over a tiny frame, the same shape as every per-source card; the
    * corpus-sized work is the caller's cap aggregation. */
  def cappedAllocation(caps: DataFrame, keyCol: String, capCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0L, "budget must be non-negative")
    val qk = graft.Names.quoted(keyCol)
    val qc = graft.Names.quoted(capCol)
    val w = Window.orderBy(col("cap").asc, col("key").asc)
    val all = Window.partitionBy(lit(1))
    caps.select(col(qk).as("key"), col(qc).cast("bigint").as("cap"))
      .withColumn("i", row_number().over(w).cast("bigint"))
      .withColumn("pfx", sum(col("cap")).over(w))
      .withColumn("n", count(lit(1)).over(all).cast("bigint"))
      .withColumn("sat", col("cap") * (col("n") - col("i")) + col("pfx") <= budget)
      .withColumn("cutv", max(when(col("sat"), col("i")).otherwise(0L)).over(all))
      .withColumn("pcut", max(when(col("sat"), col("pfx")).otherwise(0L)).over(all))
      // unused when cutv = n (everyone saturated); greatest() keeps the
      // idle division defined with the SAME value in both engines
      .withColumn("lvl",
        expr(s"($budget - pcut) div greatest(n - cutv, 1L)"))
      .withColumn("rem",
        expr(s"($budget - pcut) - lvl * greatest(n - cutv, 1L)"))
      .withColumn("alloc",
        when(col("i") <= col("cutv"), col("cap"))
          .otherwise(least(col("cap"),
            col("lvl") + when(col("i") - col("cutv") <= col("rem"), 1L)
              .otherwise(0L))))
      .select(col("key").as(keyCol), col("cap").as("cap_tokens"),
        col("alloc").as("alloc_tokens"),
        (col("i") <= col("cutv")).as("saturated"))
  }

  /** Temperature-derived source mixing card: per stratum, the sampling
    * weight a multilingual/multi-source training run assigns under
    * temperature T=2 reweighting — weight ∝ tokens^(1/2), the standard
    * up-weighting of small sources against head domination (q57's
    * [[tokenBudgetMixture]] consumes CALLER-chosen weights; this
    * derives them from the corpus itself).
    *
    * Determinism: `sqrt` is IEEE-correctly-rounded in both the JVM and
    * DuckDB, and `floor(sqrt(n)·10⁶)` is one multiply + one floor on
    * that exact value, so `weight_fp` replays bit-for-bit; everything
    * downstream (`mixture_ppm`, `epochs_fp`) is integer division. The
    * epochs product runs in decimal(38,0) — `total_tokens ·
    * mixture_ppm` exceeds Long range at ~10¹³ corpus tokens, well
    * inside 100 TB reach.
    *
    * Scale shape: one per-stratum aggregation (map-side combined),
    * then a broadcast of the two-scalar totals row — the card is
    * #strata rows end to end, no corpus-sized shuffle. */
  def temperatureMixture(df: DataFrame, stratumCol: String,
      tokenCol: String): DataFrame = {
    val qs = graft.Names.quoted(stratumCol)
    val qt = graft.Names.quoted(tokenCol)
    // persisted (Caches-tracked): the #strata-row aggregate feeds both
    // the output and the totals branch — without materialization the
    // corpus scan + tokenize runs once per consumer (the
    // [[tokenBudgetMixture]] precedent)
    val agg = Caches.persistTracked(df.filter(col(qs).isNotNull)
      .groupBy(col(qs))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(qt).cast("decimal(38,0)")).cast("bigint").as("n_tokens"))
      .withColumn("weight_fp",
        floor(sqrt(col("n_tokens").cast("double")) * 1e6).cast("bigint")))
    val tot = agg.agg(sum(col("weight_fp")).cast("bigint").as("tw"),
      sum(col("n_tokens").cast("decimal(38,0)")).cast("bigint").as("tn"))
    agg.crossJoin(broadcast(tot))
      .withColumn("mixture_ppm",
        expr("cast((cast(weight_fp as decimal(38,0)) * 1000000) div greatest(tw, 1L) as bigint)"))
      .withColumn("epochs_fp",
        expr("cast((cast(tn as decimal(38,0)) * mixture_ppm) div greatest(n_tokens, 1L) as bigint)"))
      .drop("tn", "tw")
  }

  /** Exact integer square root as a Column: ⌊√v⌋ with the ±1 CASE
    * correction, so the result is pure integer arithmetic — the
    * double-precision seed can be off by one ulp on either engine,
    * the correction lands both on the same integer. `v` must be a
    * non-negative BIGINT (< 2⁶² so (s+1)² cannot overflow). */
  private[graft] def isqrt(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val s0 = floor(sqrt(v.cast("double"))).cast("bigint")
    val down = when((s0 * s0) > v, s0 - 1L).otherwise(s0)
    when(((down + 1L) * (down + 1L)) <= v, down + 1L).otherwise(down)
  }

  /** Neyman (variance-optimal) allocation of a measurement budget
    * across strata — the survey-sampling rule an eval-labeling budget
    * should follow instead of proportional: sample stratum h in
    * proportion to N_h·σ_h, so variable strata get the labels and
    * homogeneous ones stop wasting them (Neyman 1934). Proportional
    * sampling is optimal only when every stratum has the SAME
    * variance — this card prices exactly that gap.
    *
    * Exact spelling: with per-stratum count n_h and metric sums Σt,
    * Σt², the population-σ weight is
    *
    *   w_h = n_h·σ_h = √(n_h·Σt² − (Σt)²)   (the variance NUMERATOR)
    *
    * taken by [[isqrt]] — pure integer arithmetic, no IEEE
    * composition to drift. Both allocations (∝ w_h and ∝ n_h) round
    * by largest remainder ranked (remainder desc, stratum asc), so
    * each sums to the budget EXACTLY. The card also carries the
    * variance-of-the-mean ratio both designs achieve,
    * vr = (Σw)² / (N·Σ⌊varnum_h/n_h⌋) in floor ppm (≤ 10⁶ by
    * Cauchy–Schwarz; the per-term floor is part of the definition so
    * both engines replay it bit-for-bit). Null strata are excluded;
    * null metrics count as 0. Degenerate all-constant corpus (every
    * w_h = 0): the Neyman arm grants one unit per stratum in stratum
    * order until the budget or the strata run out — with zero
    * variance anywhere, one sample per stratum IS the optimal
    * design, and budget beyond that is honestly unspendable. Scale
    * shape: ONE corpus aggregate to the #strata-row frame; the
    * allocation windows walk that tiny frame (the cappedAllocation
    * contract).
    *
    * Output per stratum: `(stratum, n_docs, w, alloc_neyman,
    * alloc_prop, neyman_vs_prop_ppm)`. */
  def neymanAllocation(df: DataFrame, stratumCol: String,
      metricCol: String, budget: Long): DataFrame = {
    require(budget >= 0L, "budget must be non-negative")
    val qs = graft.Names.quoted(stratumCol)
    val qm = graft.Names.quoted(metricCol)
    val agg = Caches.persistTracked(df.filter(col(qs).isNotNull)
      .groupBy(col(qs).cast("string").as("stratum"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col(qm).cast("decimal(38,0)")), lit(0L)
          .cast("decimal(38,0)")).cast("bigint").as("st"),
        coalesce(sum((col(qm).cast("decimal(38,0)") * col(qm))),
          lit(0L).cast("decimal(38,0)")).as("st2"))
      .withColumn("__varnum_dec", expr(
        "cast(n_docs as decimal(38,0)) * st2 " +
          "- cast(st as decimal(38,0)) * st"))
      // isqrt's precondition (v < 2^62 so (s+1)^2 can't overflow) is
      // ENFORCED, not assumed: Spark's non-ANSI decimal->bigint cast
      // silently nulls past 2^63 (mispricing every allocation with no
      // error) while DuckDB's CAST raises — raise_error makes both
      // engines fail loudly and identically on a too-hot stratum.
      // The NULL arm catches every upstream silent overflow in the
      // same funnel: st's decimal->bigint cast nulling past 2^63, or
      // the st2 / n_docs*st2 decimal(38) products overflowing —
      // without it a nulled term reads as `false` in the >= test and
      // the stratum drops out of the weights with no error.
      .withColumn("__varnum",
        when(col("__varnum_dec").isNull ||
            col("__varnum_dec") >= lit("4611686018427387904")
              .cast("decimal(38,0)"),
          raise_error(concat(
            lit("neymanAllocation: variance numerator >= 2^62 (or an "),
            lit("upstream sum overflowed) for stratum "),
            col("stratum"),
            lit(" — rescale the metric before allocating"))).cast("bigint"))
          .otherwise(col("__varnum_dec").cast("bigint")))
      .drop("__varnum_dec")
      .withColumn("w", isqrt(col("__varnum"))))
    def apportion(weightCol: String, out: String): DataFrame = {
      val tot = agg.agg(sum(col(weightCol).cast("decimal(38,0)"))
        .as("tw"))
      val base = agg.select(col("stratum"), col(weightCol).as("__w"))
        .crossJoin(broadcast(tot))
        .withColumn("__fl", expr(
          s"cast(cast(__w as decimal(38,0)) * $budget div greatest(tw, 1) as bigint)"))
        .withColumn("__rem", expr(
          s"cast(cast(__w as decimal(38,0)) * $budget % greatest(tw, 1) as decimal(38,0))"))
      val spent = base.agg(sum(col("__fl")).cast("bigint").as("__spent"))
      base.crossJoin(broadcast(spent))
        .withColumn("__rk", row_number().over(Window
          .orderBy(col("__rem").desc, col("stratum"))).cast("bigint"))
        .withColumn(out, col("__fl") +
          when(col("__rk") <= lit(budget) - col("__spent"), 1L)
            .otherwise(0L))
        .select(col("stratum"), col(out))
    }
    val vr = agg.agg(
        sum(col("w").cast("decimal(38,0)")).as("sw"),
        sum(col("n_docs").cast("decimal(38,0)")).as("nn"),
        sum(expr("__varnum div n_docs").cast("decimal(38,0)")).as("tv"))
      .select(expr("cast(case when nn * tv > 0 then sw * sw * 1000000 " +
        "div (nn * tv) else 1000000 end as bigint)")
        .as("neyman_vs_prop_ppm"))
    agg.select(col("stratum"), col("n_docs"), col("w"))
      .join(apportion("w", "alloc_neyman"), Seq("stratum"))
      .join(apportion("n_docs", "alloc_prop"), Seq("stratum"))
      .crossJoin(broadcast(vr))
  }
}
