package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Behavior tests for dedup + text analysis on data with actual
  * duplicates and edge cases (the driver testdata has none). */
class LlmSpec extends AnyFunSuite with SparkTestSession {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the mat"),          // exact dup of 1
      (3L, "  The   cat sat  on the MAT "),    // normalized dup of 1
      (4L, "completely different text here"),
      (5L, ""),                                 // empty doc
      (6L, "der hund und die katze ist da"),    // German-ish
    ).toDF("doc_id", "text")
  }

  test("maxPropagate: halving per hop, max not sum, bounded by rounds") {
    import spark.implicits._
    // chain 1–2–3–4 with spam seed at 1; 5 isolated; 6–7 both spam
    // (max must not stack); edges given one-directionally — the
    // operator symmetrizes
    val seeds = Seq((1L, 1000000L), (2L, 0L), (3L, 0L), (4L, 0L),
      (5L, 0L), (6L, 1000000L), (7L, 1000000L))
      .toDF("doc_id", "s")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (6L, 7L))
      .toDF("src", "dst")
    val got = Dedup.maxPropagate(seeds, edges, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(
      1L -> 1000000L,  // seed keeps its own score
      2L -> 500000L,   // one hop
      3L -> 250000L,   // two hops
      4L -> 0L,        // three hops — beyond the round budget
      5L -> 0L,        // isolated
      6L -> 1000000L, 7L -> 1000000L)) // two adjacent seeds: max, no stacking
  }

  test("maxPropagate: unseeded edge nodes relay instead of cutting paths") {
    import spark.implicits._
    // chain 1–2–3 where ONLY 1 and 3 appear in seeds: node 2 exists
    // solely as an edge endpoint. It must enter at s=0, RECEIVE a
    // halved score, and RELAY the quartered score on to 3 — the
    // advisor's r13 finding was that a missing score row silently cut
    // every path through an unseeded node.
    val seeds = Seq((1L, 1000000L), (3L, 0L)).toDF("doc_id", "s")
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val got = Dedup.maxPropagate(seeds, edges, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(
      1L -> 1000000L,
      2L -> 500000L,   // unseeded, surfaced in the output at its hop score
      3L -> 250000L))  // the relay the old code lost
  }

  test("exact dedup keeps the smallest doc_id per identical text") {
    val out = Dedup.exact(docs, Seq("text"), "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(out.toSeq == Seq(1L, 3L, 4L, 5L, 6L))
  }

  test("fingerprint dedup also collapses reformatted copies") {
    val out = Dedup.byFingerprint(docs, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(out.toSeq == Seq(1L, 4L, 5L, 6L))
  }

  test("dedup and dup-span operators survive dotted / hostile column names") {
    import spark.implicits._
    val dotted = docs.withColumnRenamed("doc_id", "d.id").withColumnRenamed("text", "the text")
    // exact + byFingerprint: parsed key/tie-break names must be quoted
    assert(Dedup.exact(dotted, Seq("the text"), "d.id").count() == 5L)
    assert(Dedup.byFingerprint(dotted, "the text", "d.id").count() == 4L)
    // a caller column named like the old fixed working column
    assert(Dedup.exact(docs.withColumn("__rn", lit(7)), Seq("text"), "doc_id")
      .columns.contains("__rn"))
    // dupSpanStats + shingleSets interpolate names into expr()
    assert(Dedup.dupSpanStats(dotted, "d.id", "the text", gramN = 3).count() == 6L)
    assert(MinHashLSH.shingleSets(dotted, "d.id", "the text", 3).count() == 6L)
  }

  test("token count handles empty and padded strings") {
    val got = docs.select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got(1L) == 6)
    assert(got(3L) == 6) // padded whitespace does not create tokens
    assert(got(5L) == 0)
  }

  test("language ID picks the profile with most stopword hits") {
    val got = docs.select(col("doc_id"), TextAnalysis.langId("text").as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "en")
    assert(got(6L) == "de")
    assert(got(5L) == "und") // empty doc: no profile hit
  }

  test("quality score is deterministic and bounded") {
    val scores = docs.select(TextAnalysis.qualityScoreFp("text"))
      .collect().map(_.getLong(0))
    assert(scores.forall(s => s >= 0 && s <= 1000000))
  }

  test("stopword ratio fixed-point: exact value on a known doc") {
    // "the cat sat on the mat": hits = the,the = 2 of 6 → floor(1e6*2/6)
    val v = docs.filter(col("doc_id") === 1)
      .select(TextAnalysis.stopwordRatioFp(col("text"), TextAnalysis.DefaultStopwords))
      .collect()(0).getLong(0)
    assert(v == 333333L)
  }

  test("connected components: multi-hop chains collapse to the min id") {
    import spark.implicits._
    val vertices = (1L to 10L).toDF("doc_id")
    // chain 1-2-3-4 (via pairwise links), pair 7-9, singletons 5,6,8,10
    val edges = Seq((2L, 3L), (1L, 2L), (3L, 4L), (9L, 7L)).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(vertices, edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 6L, 7L -> 7L, 8L -> 8L, 9L -> 7L, 10L -> 10L))
  }

  test("cohesionCard: a planted chain-merge reads tree-shaped with a weak " +
      "min link; a true dup set reads complete with high links") {
    import spark.implicits._
    // cluster {1,2,3}: the chain 1~2~3 (1≁3 never verified) with the
    // 2~3 link barely over a 0.5 threshold — the chain-merge shape;
    // cluster {7,8,9}: the complete triangle at high similarity;
    // 5 is a singleton and must not appear on the card
    val pairs = Seq(
      (1L, 2L, 900000L), (2L, 3L, 510000L),
      (7L, 8L, 980000L), (8L, 9L, 970000L), (7L, 9L, 960000L))
      .toDF("doc_a", "doc_b", "jaccard_fp")
    val clusters = Dedup.connectedComponents(
      Seq(1L, 2L, 3L, 5L, 7L, 8L, 9L).toDF("doc_id"),
      pairs.select(col("doc_a"), col("doc_b")))
    val card = Dedup.cohesionCard(pairs, clusters).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getLong(5)))).toMap
    assert(card.keySet === Set(1L, 7L), "singletons stay off the card")
    // chain: 3 docs, 2 edges, density 2·2/(3·2) = 666666 ppm, a tree,
    // weakest admitted link is the 0.51 bridge
    assert(card(1L) === ((3L, 2L, 666666L, true, 510000L)))
    // triangle: complete (density 10^6), not a tree, min link 0.96
    assert(card(7L) === ((3L, 3L, 1000000L, false, 960000L)))
  }

  test("connected components match brute-force union-find on a random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val n = 60
    val edges = (0 until 50).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    // driver-side union-find reference
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = (0 until n).map(i => i.toLong -> find(i).toLong).toMap
    val got = Dedup.connectedComponents(
      (0L until n.toLong).toDF("doc_id"), edges.toDF("doc_a", "doc_b"))
      .as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("connected components: convergence rides the checkpoint action, no per-round count") {
    import spark.implicits._
    // the observed metric (CollectMetrics) must carry convergence
    // detection inside the same action that materializes each round's
    // checkpoint — a funcName=="count" execution would mean the old
    // two-actions-per-round shape regressed
    val counts = new java.util.concurrent.atomic.AtomicInteger()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        if (funcName == "count") counts.incrementAndGet()
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, error: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val got = Dedup.connectedComponents(
        (1L to 5L).toDF("doc_id"), Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b"))
        .as[(Long, Long)].collect().toMap
      assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L))
      // the execution-listener bus is async; give posted events a beat
      Thread.sleep(1000)
      assert(counts.get() == 0,
        s"expected zero count() actions during label propagation, saw ${counts.get()}")
    } finally spark.listenerManager.unregister(listener)
  }

  test("repetition stats: duplicate 3-gram fraction on planted docs") {
    import spark.implicits._
    val d = Seq(
      "a b c a b c a b c",  // 7 3-grams: abc bca cab abc bca cab abc → 3 distinct → 4 dup
      "x y z w",            // 2 distinct 3-grams, 0 dup
      "one two",            // < 3 tokens → 0 3-grams
      "").toDF("text")
    val rows = d
      .select(TextAnalysis.tokens(col("text")).as("toks"))
      .select(TextAnalysis.word3grams("toks").as("g3"))
      .select(org.apache.spark.sql.functions.size(col("g3")).as("n"),
        TextAnalysis.dup3gramFp("g3").as("fp"))
      .as[(Int, Long)].collect().toSeq
    assert(rows == Seq((7, 571428L), (2, 0L), (0, 0L), (0, 0L)))
  }

  test("dupSpanStats: shared 8-gram spans detected, unique text scores 0") {
    import spark.implicits._
    val span = "one two three four five six seven eight" // exactly 8 tokens
    val docs = Seq(
      (1L, s"alpha beta $span gamma delta"),   // shares the span with 2
      (2L, s"epsilon zeta $span eta theta"),   // shares the span with 1
      (3L, "iota kappa lambda mu nu xi omicron pi rho sigma"), // unique
      (4L, "tau upsilon"),                     // < 8 tokens → 1 collapsed gram
      (5L, ""), (6L, "   "),                   // blank: excluded, 0s — must
                                               // NOT pair with each other
    ).toDF("doc_id", "text")
    val got = Dedup.dupSpanStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // docs 1/2: 12 tokens → 5 distinct 8-grams each, exactly one shared
    assert(got(1L) == ((5L, 1L, 200000L)))
    assert(got(2L) == ((5L, 1L, 200000L)))
    assert(got(3L) == ((3L, 0L, 0L)))
    assert(got(4L)._2 == 0L && got(4L)._3 == 0L) // collapsed gram unshared
    assert(got(5L) == ((0L, 0L, 0L)))
    assert(got(6L) == ((0L, 0L, 0L)))
  }

  test("segmentDupStats: non-overlapping windows, within-doc repeats count") {
    import spark.implicits._
    val seg = "a b c" // one full 3-token segment
    val docs = Seq(
      (1L, s"$seg $seg x"),        // segments: [a b c], [a b c], [x] — the
                                   // repeated segment is duplicated WITHIN doc 1
      (2L, s"$seg y z q"),         // [a b c] duplicated cross-doc, [y z q] unique
      (3L, "p q"),                 // one short segment, unique
      (4L, ""),                    // blank: 0 segments, survives via left join
    ).toDF("doc_id", "text")
    val got = Dedup.segmentDupStats(docs, "doc_id", "text", segLen = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(1L) == ((3L, 2L, 666666L))) // floor(1e6 * 2/3)
    assert(got(2L) == ((2L, 1L, 500000L)))
    assert(got(3L) == ((1L, 0L, 0L)))
    assert(got(4L) == ((0L, 0L, 0L)))
  }

  test("segmentDupStats: segments are non-overlapping (tail shorter than segLen kept)") {
    import spark.implicits._
    // 7 tokens at segLen=3 → ceil(7/3) = 3 segments: 2 full + 1 short tail;
    // overlapping grams would have produced 5
    val docs = Seq((1L, "t1 t2 t3 t4 t5 t6 t7")).toDF("doc_id", "text")
    val got = Dedup.segmentDupStats(docs, "doc_id", "text", segLen = 3).head()
    assert(got.getLong(1) == 3L && got.getLong(2) == 0L)
  }

  test("dupSpanStats: materialization strategy never changes results") {
    def run(g: Dedup.GramMaterialization) =
      Dedup.dupSpanStats(docs, "doc_id", "text", gramN = 3, grams = g)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val persisted = run(Dedup.GramMaterialization.Persist)
    assert(run(Dedup.GramMaterialization.Recompute) == persisted)
    assert(run(Dedup.GramMaterialization.LocalCheckpoint) == persisted)
  }

  test("deterministicGroupSample equals the naive global-window definition") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rows = (0 until 300).map(i => (i.toLong, s"g${i % 3}")) ++
      Seq((1000L, "tiny"), (1001L, "tiny")) // group smaller than k
    val df = rows.toDF("doc_id", "lang")
    val k = 10
    val got = Sampling.deterministicGroupSample(df, "lang", "doc_id", k)
      .select("doc_id", "lang").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val h = expr("cast(conv(substr(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint)")
    val naive = df.withColumn("h", h)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))))
      .filter(col("rn") <= k)
      .select("doc_id", "lang").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == naive)
    assert(got.count(_._2 == "tiny") == 2) // undersized group kept whole
    assert(got.count(_._2 == "g0") == k)
  }

  test("bigramSurprisalFp: hand-computed add-one bits; short docs report zero") {
    import spark.implicits._
    // uni: x:5 y:1 z:1 → V=3; types: (x,x):3 → ⌊log2(8/4)⌋=1 bit,
    // (x,y):1 → ⌊log2(8/2)⌋=2 bits
    val docs = Seq((1L, "x x x x"), (2L, "x y"), (3L, "z"), (4L, ""))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramSurprisalFp(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(1L) === ((3L, 3L, 1000000L))) // three (x,x) pairs, 1 bit each
    assert(out(2L) === ((1L, 2L, 2000000L))) // the rarer transition costs more
    assert(out(3L) === ((0L, 0L, 0L)))       // single token: no bigrams
    assert(out(4L) === ((0L, 0L, 0L)))
  }

  test("scoreCalibration: exact percentile ranks, ties share, singleton is 0") {
    import spark.implicits._
    val df = Seq((1L, "A", 10L), (2L, "A", 20L), (3L, "A", 20L), (4L, "A", 30L),
      (5L, "B", 100L)).toDF("id", "src", "score")
    val out = TextAnalysis.scoreCalibration(df, "src", "score")
      .select("id", "pct_ppm").as[(Long, Long)].collect().toMap
    assert(out(1L) === 0L)        // group min → 0
    assert(out(2L) === 333333L)   // 1 of 3 below, ties share
    assert(out(3L) === 333333L)
    assert(out(4L) === 1000000L)  // group max → 1e6
    assert(out(5L) === 0L)        // singleton group
    // calibration is per-group: identical raw scores in different
    // groups may land on different percentiles
    val two = Seq((1L, "A", 5L), (2L, "A", 9L), (3L, "B", 9L), (4L, "B", 11L))
      .toDF("id", "src", "score")
    val o2 = TextAnalysis.scoreCalibration(two, "src", "score")
      .select("id", "pct_ppm").as[(Long, Long)].collect().toMap
    assert(o2(2L) === 1000000L && o2(3L) === 0L) // same score 9, opposite ends
  }

  test("robustOutliers: lower median/MAD, 3·MAD flag, singleton unflagged") {
    import spark.implicits._
    // A: [1,2,3,100] → med=2 (cum≥(4+1)div2=2), devs [1,0,1,98] →
    // mad=1; only |100−2|=98 > 3 flags. The 100 cannot drag the
    // median the way it would drag a mean.
    val df = Seq((1L, "A", 1L), (2L, "A", 2L), (3L, "A", 3L), (4L, "A", 100L),
      (5L, "B", 7L)).toDF("id", "grp", "v")
    val out = TextAnalysis.robustOutliers(df, "grp", "v")
      .select("id", "med", "mad", "is_outlier")
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 2L, 1L, false)))
    assert(out(4L) === ((4L, 2L, 1L, true)))  // the planted outlier
    assert(out.values.count(_._4) === 1)
    assert(out(5L) === ((5L, 7L, 0L, false))) // singleton: mad 0, unflagged
  }

  test("histogramDrift: ppm-share L2 vs corpus; unhit buckets still charged") {
    import spark.implicits._
    // X buckets [0,1,1]; Y buckets [0,50 capped]; global b0:2 b1:2 b50:1
    val df = Seq((1L, "X", 5L), (2L, "X", 15L), (3L, "X", 15L),
      (4L, "Y", 5L), (5L, "Y", 500000L)).toDF("id", "src", "v")
    val out = TextAnalysis.histogramDrift(df, "src", "v")
      .select("src", "n_rows", "drift_l2")
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    def sq(x: Long) = x * x
    def sh(o: Long, n: Long) = o * 1000000L / n
    val xDrift = sq(sh(1, 3) - sh(2, 5)) + sq(sh(2, 3) - sh(2, 5)) +
      sq(0L - sh(1, 5)) // X never hits b50 yet is charged (0 − g_50)²
    val yDrift = sq(sh(1, 2) - sh(2, 5)) + sq(0L - sh(2, 5)) +
      sq(sh(1, 2) - sh(1, 5))
    assert(out("X") === ((3L, xDrift)))
    assert(out("Y") === ((2L, yDrift)))
  }

  test("weightedGroupSample equals the naive weighted-priority window") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(67)
    val rows = (0 until 400).map(i =>
      (i.toLong, s"g${i % 3}", 1L + rnd.nextInt(5000))) ++
      Seq((1000L, "tiny", 7L), (1001L, "tiny", 9000L)) // undersized group
    val df = rows.toDF("doc_id", "lang", "w")
    val k = 10
    val got = Sampling.weightedGroupSample(df, "lang", "doc_id", "w", k)
      .select("doc_id", "lang", "_priority").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val h = expr("cast(conv(substr(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint)")
    val naive = df.withColumn("h", h)
      .withColumn("pri", expr("(h * 1000000L) div w"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("pri"), col("doc_id"))))
      .filter(col("rn") <= k)
      .select("doc_id", "lang", "pri").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == naive)
    assert(got.count(_._2 == "tiny") == 2) // undersized group kept whole
    // the bias is real: sampled rows carry systematically larger
    // weights than the group average
    val wById = rows.map(r => r._1 -> r._3).toMap
    val sampledMean = got.filter(_._2 != "tiny").toSeq
      .map(t => wById(t._1)).sum / (3.0 * k)
    val popMean = rows.filter(_._2 != "tiny").map(_._3).sum / 400.0
    assert(sampledMean > popMean,
      s"weighting had no effect: sampled mean $sampledMean vs $popMean")
    // zero/negative weights and null keys never participate
    val bad = Seq((1L, "g", 0L), (2L, "g", -5L), (3L, "g", 10L)).toDF("doc_id", "lang", "w")
    val kept = Sampling.weightedGroupSample(bad, "lang", "doc_id", "w", 5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(3L))
  }

  test("tokenBudgetMixture: rates follow the target weights; selection deterministic") {
    import spark.implicits._
    // two strata, equal token mass (1000 each), weights 1 vs 3, budget
    // 50% → rate_a = (1/4)·(0.5·2000)/1000 = 0.25, rate_b = 0.75
    val df = (0 until 100).map(i => (i.toLong, if (i < 50) "a" else "b", 20L))
      .toDF("id", "src", "n_tok")
    def run() = Sampling.tokenBudgetMixture(df, "src", "id", "n_tok",
      weightExpr = when(col("src") === "a", 1).otherwise(3),
      budgetFraction = 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    val kept = run()
    assert(run() == kept) // pure function of the data
    val aKept = kept.count(_ < 50)
    val bKept = kept.size - aKept
    // md5 prefixes are uniform: expect ~12.5 and ~37.5 of 50 each
    assert(aKept > 2 && aKept < 25, s"rate_a=0.25 kept $aKept of 50")
    assert(bKept > 25 && bKept < 50, s"rate_b=0.75 kept $bKept of 50")
    // a stratum whose rate saturates keeps every row
    val all = Sampling.tokenBudgetMixture(df, "src", "id", "n_tok",
      weightExpr = lit(1), budgetFraction = 1.0)
    assert(all.count() == 100L)
    // zero/null weights would make rates 0/0 = NaN → least(1, NaN) = 1
    // → the whole corpus "sampled"; must fail loudly instead
    val e = intercept[IllegalArgumentException] {
      Sampling.tokenBudgetMixture(df, "src", "id", "n_tok",
        weightExpr = lit(0), budgetFraction = 0.5)
    }
    assert(e.getMessage.contains("positive"))
    // null keys/strata are excluded from the token mass, not counted
    // against the budget: adding rows that are un-selectable anyway
    // (null key / null stratum) must leave every rate — and therefore
    // the selected set — exactly as it was
    val nullKey = Seq.fill(25)(("a", 20L)).toDF("src", "n_tok")
      .selectExpr("CAST(NULL AS BIGINT) AS id", "src", "n_tok")
    val nullSrc = (200 until 225).map(i => (i.toLong, 20L)).toDF("id", "n_tok")
      .selectExpr("id", "CAST(NULL AS STRING) AS src", "n_tok")
    val withNulls = df.unionByName(nullKey).unionByName(nullSrc)
    val keptWithNulls = Sampling.tokenBudgetMixture(withNulls, "src", "id", "n_tok",
      weightExpr = when(col("src") === "a", 1).otherwise(3),
      budgetFraction = 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(keptWithNulls == kept,
      "null-key/null-stratum rows changed the realized rates or leaked into the sample")
  }

  test("deterministicGroupSample survives dotted column names") {
    import spark.implicits._
    val df = (0 until 40).map(i => (s"g${i % 3}", s"key_$i")).toDF("the.group", "the key")
    val out = Sampling.deterministicGroupSample(df, "the.group", "the key", k = 4)
      .collect()
    assert(out.length == 12) // 3 groups x 4
    // same result as with plain names (quoting must not change selection)
    val plain = Sampling.deterministicGroupSample(
      df.withColumnRenamed("the.group", "g").withColumnRenamed("the key", "k"),
      "g", "k", k = 4)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out.map(r => (r.getString(0), r.getString(1))).toSet == plain)
  }

  test("deterministicGroupSample: null keys are excluded, not a margin failure") {
    import spark.implicits._
    val df = Seq((Some(1L), "g"), (Some(2L), "g"), (None, "g"), (None, "g"))
      .toDF("doc_id", "lang")
    // 2 non-null keys <= k → both kept; null-key rows neither counted
    // nor sampled (they have no deterministic position)
    val got = Sampling.deterministicGroupSample(df, "lang", "doc_id", k = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L))
  }

  test("ruleFilter: each rule fires its own bit; a clean doc is kept") {
    import spark.implicits._
    val goodBody = ("the report is a summary of the work and it is clear " +
      "that the results of the study are good and the methods are sound ").trim
    val planted = Seq(
      (1L, goodBody),                                   // clean: kept
      (2L, "too short"),                                // bit 0
      (3L, Seq.fill(1200)("the").mkString(" ") + " " + goodBody), // bit 1 (long, stopword-rich)
      (4L, null.asInstanceOf[String]),                  // null → empty → bit 0 (+2)
      (5L, goodBody + " " + Seq.fill(12)("alpha beta gamma").mkString(" ")), // bit 4: repeats
      (6L, goodBody + " " + Seq.fill(30)("1234567890").mkString(" ")) // bit 5: digits
    ).toDF("doc_id", "text")
    val out = TextAnalysis.ruleFilter(planted, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(out(1L) == (0L, true), s"clean doc flagged: ${out(1L)}")
    assert((out(2L)._1 & 1L) != 0 && !out(2L)._2)
    assert((out(3L)._1 & 2L) != 0 && !out(3L)._2)
    assert((out(4L)._1 & 1L) != 0 && !out(4L)._2, "null text must be flagged, not passed")
    assert((out(5L)._1 & 16L) != 0 && !out(5L)._2)
    assert((out(6L)._1 & 32L) != 0 && !out(6L)._2)
    assert(out.size == 6, "every input row reaches the output")
  }

  test("incremental dedup: corpus membership wins, then batch order") {
    import spark.implicits._
    val corpus = Seq(
      (10L, "alpha text body"),
      (11L, "beta text body")).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "ALPHA   text body"),   // normalized dup of corpus 10
      (2L, "gamma fresh content"), // new
      (3L, "gamma fresh content"), // dup_in_batch behind 2
      (4L, "delta other content"), // new
      (5L, "Beta text BODY")       // normalized dup of corpus 11
    ).toDF("doc_id", "text")
    val got = Dedup.incremental(corpus, batch, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got == Map(1L -> "dup_of_corpus", 2L -> "new",
      3L -> "dup_in_batch", 4L -> "new", 5L -> "dup_of_corpus"))
    // a batch fp that is ALSO in the corpus: every holder classifies
    // dup_of_corpus — batch ordering never overrides the index
    val batch2 = Seq((1L, "alpha text body"), (2L, "alpha  TEXT body"))
      .toDF("doc_id", "text")
    val got2 = Dedup.incremental(corpus, batch2, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got2 == Map(1L -> "dup_of_corpus", 2L -> "dup_of_corpus"))
  }

  test("incremental dedup: null text is real (empty) content, not SQL-null limbo") {
    import spark.implicits._
    // without the coalesce guard, NULL fps group in the window (two
    // null batch docs → dup_in_batch) but never match the corpus join
    // (NULL != NULL) — contradictory statuses; with it, null ≡ empty
    val corpus = Seq((10L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val batch = Seq((1L, null.asInstanceOf[String]), (2L, ""), (3L, "real text here"))
      .toDF("doc_id", "text")
    val got = Dedup.incremental(corpus, batch, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got == Map(1L -> "dup_of_corpus", 2L -> "dup_of_corpus", 3L -> "new"))
  }

  test("unigramSurprisalFp: integer log2 arithmetic, OOV charged max bits") {
    import spark.implicits._
    // N = 9 tokens; vocabSize 1 → vocab = {x} with c = 8:
    //   bits(x) = len(bin(9 div 8)) - 1 = 0; OOV bits = len(bin(9)) - 1 = 3
    val docs = Seq(
      (1L, "x x x x x x x"), // 7 tokens, all vocab → sum 0, fp 0
      (2L, "x y"),           // x:0 + y:3 → fp = floor(1e6·3/2)
      (3L, "")               // empty → all zeros, still present
    ).toDF("doc_id", "text")
    val got = TextAnalysis.unigramSurprisalFp(docs, "doc_id", "text", vocabSize = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == ((7L, 0L, 0L)))
    assert(got(2L) == ((2L, 3L, 1500000L)))
    assert(got(3L) == ((0L, 0L, 0L)))
  }

  test("unigramSurprisalFp caches only the (w,c) aggregate, never the token stream") {
    import spark.implicits._
    Caches.unpersistAll(blocking = true)
    val docs = Seq((1L, "x x y"), (2L, "y z")).toDF("doc_id", "text")
    val df = TextAnalysis.unigramSurprisalFp(docs, "doc_id", "text", vocabSize = 2)
    df.queryExecution.toRdd.count()
    val cached = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation => r
    }
    // the skinny frequency aggregate IS cached (feeds N and the vocab),
    // while the raw exploded (doc_id, w) stream — ~1.5× the corpus at
    // 100 TB — must never be: any cached relation exposing doc_id means
    // the corpus-sized materialization came back
    assert(cached.nonEmpty, "expected the (w,c) frequency aggregate to be cached")
    cached.foreach { r =>
      val names = r.output.map(_.name)
      assert(names.toSet == Set("w", "c"),
        s"cached relation must be the skinny (w,c) aggregate, got $names")
    }
    Caches.unpersistAll(blocking = true)
  }

  test("tokenBandFilter: exact rank thresholds, ties land on the right side") {
    import spark.implicits._
    // token counts [2,2,2,5,5,9]: N=6, 30th pct rank=(180+99)/100=2 →
    // lo=2 (cum(2)=3 ≥ 2); 70th pct rank=(420+99)/100=5 → hi=5
    // (cum(5)=5); the 9-token doc falls outside the band
    val docs = Seq(
      (1L, "a b"), (2L, "c d"), (3L, "e f"),
      (4L, "a b c d e"), (5L, "f g h i j"),
      (6L, "a b c d e f g h i")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tokenBandFilter(docs, "doc_id", "text", 30, 70)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(got.values.forall { case (_, lo, hi, _) => lo == 2L && hi == 5L })
    assert(got.filter(_._2._4).keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(!got(6L)._4)
  }

  test("q76 funnel: verdicts partition the corpus; contamination count matches q45") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.queries.LlmQueries.q76CurationFunnel(spark, dir).collect()
    assert(rows.nonEmpty)
    // the four verdicts partition every language's documents
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3) + r.getLong(4) + r.getLong(5),
        s"verdicts do not partition lang ${r.getString(0)}")
    }
    // 'contaminated' outranks every other verdict, so the funnel's
    // contamination mass must equal q45's flagged-doc count exactly
    val q45Rows = graft.queries.LlmQueries.q45Decontamination(spark, dir).count()
    assert(rows.map(_.getLong(2)).sum == q45Rows)
    assert(rows.map(_.getLong(5)).sum > 0, "a real corpus must keep something")
  }

  test("q73 data card reads the documents table exactly once") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val out = graft.queries.LlmQueries.q73DataCard(spark, "/root/testdata/sf0.001")
    val scans = graft.PlanNodes.all(out.queryExecution.executedPlan)
      .collect { case s: FileSourceScanExec => s }
    assert(scans.length == 1,
      s"the carry-column design exists to avoid a second text scan; got ${scans.length}")
    // cheap sanity on the aggregates themselves
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, kept, uniq) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(kept <= n && uniq <= n && uniq >= 1)
    }
  }

  test("ruleFilter is a shuffle-free projection chain") {
    val out = TextAnalysis.ruleFilter(
      graft.Tables.documents(spark, "/root/testdata/sf0.001"), "doc_id", "text")
    // execute first: the Spread repartition makes the plan adaptive,
    // and the pre-execution AQE print carries neither the final shape
    // nor the codegen markers
    out.queryExecution.toRdd.count()
    val plan = out.queryExecution.executedPlan.toString()
    // r19: the Spread parallelism guard MAY prepend one round-robin
    // repartition on a single-split scan — that is a fan-out of the
    // input, not a keyed shuffle of ruleFilter's logic. Any OTHER
    // exchange (hash/range) still fails the spec.
    val keyedExchanges = "Exchange (?!RoundRobinPartitioning)".r
      .findAllIn(plan).length
    assert(keyedExchanges == 0,
      "ruleFilter must not shuffle by key — its logic is row-local")
    // the scan-side and bitmask projections run inside codegen stages
    // (printed as *(n)); the middle projection holds the higher-order
    // functions (aggregate/filter/transform), which Spark evaluates
    // interpreted — still row-local, still zero-shuffle
    assert(plan.contains("*("), "the bitmask/scan projections fell out of codegen")
  }

  test("collocations: planted bigram wins with hand-computed half-bit PMI") {
    import spark.implicits._
    // "new york" appears 4×; tokens: new(4) york(4) plus 8 filler
    // tokens → N = 16; PMI(new,york) = 2·log2(16·4/(4·4)) = 2·log2(4)
    // → q2 = 4
    val docs = Seq(
      (1L, "new york a b c d"),
      (2L, "new york e f g h"),
      (3L, "new york new york"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.collocations(docs, "doc_id", "text",
      minCount = 2L, topK = 5).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.head._1 === "new" && got.head._2 === "york" && got.head._3 === 4L)
    val n = 16L; val cab = 4L; val ca = 4L; val cb = 4L
    val expectedQ2 = TextAnalysis.log2Q2(BigInt(n * cab), BigInt(ca * cb))
    assert(got.head._4 === expectedQ2 && expectedQ2 === 4L)
    // a negative-PMI pair (york, new appears once; 16·1 < 4·4 is
    // false... york-new: c=1 < minCount) — anything below minCount or
    // independence is absent
    assert(!got.exists(r => r._1 == "b" || r._2 == "c"))
  }

  test("collocations: partition-invariant ranking") {
    import spark.implicits._
    val docs = (0L until 50L).map(i =>
      (i, s"alpha beta gamma delta w$i alpha beta")).toDF("doc_id", "text")
    def run(p: Int) = TextAnalysis.collocations(docs.repartition(p),
      "doc_id", "text", 2L, 10).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(run(1) === run(11))
  }

  test("vocabGrowth: exact counts at ceil-spaced prefixes, null text = empty") {
    import spark.implicits._
    val docs = Seq((0L, "a b"), (1L, "b c"), (2L, null), (3L, "a d"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.vocabGrowth(docs, "doc_id", "text", 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // chk 2 covers docs {0,1}: vocab {a,b,c}, 4 tokens; chk 4 all:
    // vocab {a,b,c,d}, 6 tokens (the null doc contributes nothing)
    assert(got === Map(2L -> ((2L, 3L, 4L)), 4L -> ((4L, 4L, 6L))))
    // checkpoints collapse when n < nCheckpoints: distinct prefixes only
    val tiny = TextAnalysis.vocabGrowth(docs.limit(1), "doc_id", "text", 5)
      .collect().map(_.getLong(0)).sorted
    assert(tiny.toSeq === Seq(1L))
  }

  test("hashSplit: disjoint, exhaustive, stable under repartition and append") {
    import spark.implicits._
    val docs = (0L until 500L).map(d => (d, s"doc $d")).toDF("doc_id", "text")
    val got = Sampling.hashSplit(docs, "doc_id", 90, 5)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size === 500, "one verdict per row, splits exhaustive")
    val byS = got.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byS.keySet === Set("train", "val", "test"))
    assert(byS("train") > byS("val") && byS("train") > byS("test"))
    // the assignment is a pure key function: any layout, any subset
    val re = Sampling.hashSplit(docs.repartition(13), "doc_id", 90, 5)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(re === got)
    val subset = Sampling.hashSplit(docs.filter($"doc_id" < 100), "doc_id", 90, 5)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    subset.foreach { case (d, s) => assert(got(d) === s) }
    // degenerate fences refused
    assertThrows[IllegalArgumentException] {
      Sampling.hashSplit(docs, "doc_id", 95, 5)
    }
  }

  test("charCollisionFp: mash flags, prose does not; fold == count model") {
    import spark.implicits._
    val fx = Seq(
      (1L, "aaaaaaaaaaaaaaaaaaaaaaaa"),          // pure mash -> ~1e6
      (2L, "the quick brown fox jumps over it"), // prose -> low
      (3L, "ababababababababab"),                // two-char mash -> ~0.5
      (4L, ""), (5L, "x"), (6L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = fx
      .withColumn("cs", TextAnalysis.sortedChars(col("text")))
      .select(col("doc_id"), TextAnalysis.charCollisionFp("cs").as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent model: chars -> counts -> sum c(c-1) / n(n-1)
    def model(t: String): Long = {
      val n = t.length.toLong
      if (n < 2) 0L
      else {
        val coll = t.groupBy(identity).values
          .map(g => g.length.toLong * (g.length - 1)).sum
        (BigInt(1000000) * BigInt(coll) / BigInt(n * (n - 1))).toLong
      }
    }
    Seq(1L -> "aaaaaaaaaaaaaaaaaaaaaaaa",
        2L -> "the quick brown fox jumps over it",
        3L -> "ababababababababab").foreach { case (id, t) =>
      assert(got(id) === model(t), s"doc $id")
    }
    assert(got(1L) === 1000000L, "single-char mash collides always")
    assert(got(1L) > 300000L && got(3L) > 300000L, "mash flags")
    assert(got(2L) < 300000L, "prose must not flag")
    assert(got(4L) === 0L && got(5L) === 0L && got(6L) === 0L,
      "sub-2-char and null docs read 0")
  }

  test("sentenceStats: prose passes, fragments and run-ons flag; " +
      "portable split drops blanks") {
    import spark.implicits._
    val fx = Seq(
      (1L, "The cat sat. The dog ran! Did the bird fly? Yes."),
      (2L, "one fragment without terminal punctuation at all"),
      (3L, ("word " * 70).trim + "."),
      (4L, ""), (5L, null.asInstanceOf[String]),
      (6L, "Ends with dots... and more!!! exactly??"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.sentenceStats(fx, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    // 4 sentences of 3/3/4/1 tokens
    assert(got(1L) === ((4L, 11L, 275L, 4L)))
    // no terminal punctuation = one sentence
    assert(got(2L)._1 === 1L)
    // 70-token single sentence: run-on territory
    assert(got(3L) === ((1L, 70L, 7000L, 70L)))
    assert(got(4L) === ((0L, 0L, 0L, 0L)))
    assert(got(5L) === ((0L, 0L, 0L, 0L)))
    // runs of terminators collapse; blank tails drop
    assert(got(6L)._1 === 3L)
  }

  test("proximityCounts: window semantics exact; superset of phrase hits") {
    import spark.implicits._
    val fx = Seq(
      (1L, "table hash"),                     // adjacent, dist 1
      (2L, "hash x y z w table"),             // dist 5, reverse order
      (3L, "table a b c d e hash"),           // dist 6: outside window
      (4L, "table table hash"),               // two a-occurrences in reach
      (5L, "no terms here")).toDF("doc_id", "text")
    val p = Postings.build(fx, "doc_id", "text")
    val got = Postings.proximityCounts(p, "table", "hash", 5).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(1L -> ((1L, 1L)), 2L -> ((1L, 5L)),
      4L -> ((2L, 1L))))
    // proximity at any window >= 1 covers every phrase hit
    val phrase = Postings.phraseCounts(p, "table", "hash").collect()
      .map(_.getLong(0)).toSet
    assert(phrase.subsetOf(got.keySet))
  }

  test("gateDisparity: a group the gate systematically fails flags " +
      "adverse; balanced groups do not") {
    import spark.implicits._
    // gate-passing prose: >= 20 tokens, mean length in [3,10], 25%
    // stopwords, all 3-grams distinct, zero digits
    def prose(i: Int): String = (0 until 24).map { j =>
      if (j % 4 == 0) "the"
      else {
        val v = i * 24 + j
        s"word${('a' + v % 26).toChar}${('a' + (v / 26) % 26).toChar}"
      }
    }.mkString(" ")
    val digits = "12345 67890 11111 22222 33333 44444 55555 66666 " * 3
    val fx = ((0 until 20).map(i => (i.toLong, prose(i), "en")) ++
      (100 until 120).map(i => (i.toLong, digits + i, "zz")))
      .toDF("doc_id", "text", "lang")
    val got = TextAnalysis.gateDisparity(fx, "doc_id", "text", "lang")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(got("en")._2 === 1000000L, "the clean group is the baseline")
    assert(got("zz")._3, "the digit-spam group must flag adverse")
    assert(!got("en")._3)
    // balanced fixture: same text shapes in both groups -> no flag
    val fair = ((0 until 20).map(i => (i.toLong, prose(i), "en")) ++
      (100 until 120).map(i => (i.toLong, prose(i), "de")))
      .toDF("doc_id", "text", "lang")
    val fg = TextAnalysis.gateDisparity(fair, "doc_id", "text", "lang")
      .collect().map(r => r.getString(0) -> r.getBoolean(5)).toMap
    assert(fg.values.forall(!_), "identical mixes cannot flag")
  }

  test("watermark screen: greedily-watermarked text flags at 3-sigma; " +
      "random text does not; counts match the model") {
    import spark.implicits._
    // the SAME green predicate as greenCount: md5 of "prev cur",
    // first 15 hex chars as a long, even = green
    def green(prev: String, cur: String): Boolean = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$prev $cur".getBytes("UTF-8"))
      val hex = d.map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 2 == 0
    }
    val vocab = (0 until 40).map(i => s"tok$i")
    // watermarking generator: always pick the first green continuation
    def watermarked(n: Int): String = {
      val out = scala.collection.mutable.ListBuffer("tok0")
      while (out.size < n)
        out += vocab.find(green(out.last, _)).getOrElse(vocab.head)
      out.mkString(" ")
    }
    // "human" text: arithmetic next-token choice, blind to the hash
    def natural(n: Int, seed: Int): String =
      (0 until n).map(i => vocab((seed + i * 7) % 40)).mkString(" ")
    val fx = Seq(
      (1L, watermarked(80)), (2L, natural(80, 3)), (3L, natural(80, 11)),
      (4L, watermarked(40))) // below the 50-pair floor: never flags
      .toDF("doc_id", "text")
    val got = graft.queries.LlmQueries.queries("q293_watermark_screen")
    // run the operator chain directly on the fixture
    val frame = fx
      .withColumn("toks", TextAnalysis.tokens(col("text")))
      .withColumn("g2", TextAnalysis.wordNgrams("toks", 2))
      .select(col("doc_id"),
        size(col("g2")).cast("bigint").as("n_pairs"),
        TextAnalysis.greenCount("g2").as("n_green"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // model check on every doc
    fx.collect().foreach { r =>
      val toks = r.getString(1).trim.split("\\s+").toSeq
      val pairs = toks.sliding(2).toSeq.filter(_.size == 2)
      val g = pairs.count(p => green(p(0), p(1))).toLong
      assert(frame(r.getLong(0)) === ((pairs.size.toLong, g)),
        s"doc ${r.getLong(0)}")
    }
    def flags(id: Long): Boolean = {
      val (n, g) = frame(id)
      n >= 50 && 2 * g > n && (2 * g - n) * (2 * g - n) >= 9 * n
    }
    assert(flags(1L), "watermarked text must flag")
    assert(!flags(2L) && !flags(3L), "hash-blind text must not flag")
    assert(!flags(4L), "below the pair floor nothing flags")
  }
}
