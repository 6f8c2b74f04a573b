package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Hand-computed oracles for the round-12 curation cards:
  * temperature mixing weights, token-distribution TVD, and
  * sorted-neighborhood candidate pairs. */
class CurationCardsSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("boilerplateStripCard: overlapping and chained spans merge, never double-count") {
    // 2-grams with minDf=2: "a b" (docs 1,2,3) and "b c" (docs 1,2)
    // are boilerplate; doc1 "a b c d" has hits at 1,2 — chained
    // islands cover tokens 1..3 (3, not 4); doc2 "x a b c" covers
    // 2..4 (3); doc3 "a b" covers both tokens (2); doc4 clean.
    val docs = Seq(
      (1L, "a b c d", "s1"), (2L, "x a b c", "s1"),
      (3L, "a b", "s2"), (4L, "p q r", "s2"))
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.boilerplateStripCard(docs, "doc_id", "text",
        "source", n = 2, minDf = 2L, topK = 10)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out(0) === (("s1", 2L, 2L, 8L, 6L, 2L, 750000L)))
    assert(out(1) === (("s2", 2L, 1L, 5L, 2L, 3L, 400000L)))
  }

  test("temperatureMixture: sqrt weights, ppm shares, epochs — exact on a known frame") {
    // A: 100 tokens over 2 docs, B: 25 tokens over 1 doc
    val df = Seq(("A", 60L), ("A", 40L), ("B", 25L)).toDF("src", "n_tok")
    val out = Sampling.temperatureMixture(df, "src", "n_tok")
      .orderBy("src").collect()
    // sqrt(100)=10 → 10e6; sqrt(25)=5 → 5e6; tw=15e6; tn=125
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5))).toSeq == Seq(
      ("A", 2L, 100L, 10000000L, 666666L, (125L * 666666L) / 100L),
      ("B", 1L, 25L, 5000000L, 333333L, (125L * 333333L) / 25L)))
    // shares can undershoot 1e6 by flooring, never overshoot
    assert(out.map(_.getLong(4)).sum <= 1000000L)
  }

  test("temperatureMixture: null strata excluded, zero-token stratum survives") {
    val df = Seq((Some("A"), 4L), (None, 9L), (Some("B"), 0L))
      .toDF("src", "n_tok")
    val out = Sampling.temperatureMixture(df, "src", "n_tok")
      .orderBy("src").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("A", "B"))
    // B: sqrt(0)=0 weight, 0 ppm, epochs guard div-by-zero → 0
    assert(out(1).getLong(3) == 0L && out(1).getLong(4) == 0L &&
      out(1).getLong(5) == 0L)
  }

  test("tokenDivergenceFp: TVD vs hand computation incl. absent-token mass") {
    val df = Seq(("A", "x x y"), ("B", "y y y")).toDF("g", "text")
    val out = TextAnalysis.tokenDivergenceFp(df, "g", "text")
      .orderBy("g").collect()
    // corpus: x=2, y=4, N=6. A=(2x,1y): TVD=½(|2/3-1/3|+|1/3-2/3|)=1/3
    // B=(3y): TVD=½(|0-1/3|+|1-2/3|)=1/3
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq(("A", 3L, 333333L), ("B", 3L, 333333L)))
  }

  test("tokenDivergenceFp: single-source corpus has zero divergence; empty docs absent") {
    val df = Seq(("A", "a b c"), ("A", "d e"), ("B", "   ")).toDF("g", "text")
    val out = TextAnalysis.tokenDivergenceFp(df, "g", "text").collect()
    // B contributed no tokens → no distribution → absent
    assert(out.map(r => (r.getString(0), r.getLong(2))).toSeq == Seq(("A", 0L)))
  }

  test("snmPairs: in-block neighbor pairs, id-ordered, same_norm on dup texts") {
    val df = Seq(
      (2L, "aaa x"), (10L, "AAA   x"), // same normalized key "aaa x"
      (1L, "aaa z"),
      (7L, "zzz q")                    // lone block: no pairs
    ).toDF("doc_id", "text")
    val out = Dedup.snmPairs(df, "doc_id", "text").orderBy("doc_lo", "doc_hi")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    // block "aaa " sort order: ("aaa x",2), ("aaa x",10), ("aaa z",1)
    assert(out.toSeq == Seq(
      ("aaa ", 1L, 2L, 2L, 0L, false),
      ("aaa ", 1L, 10L, 1L, 0L, false),
      ("aaa ", 2L, 10L, 1L, 0L, true)))
  }

  test("shardPlan: shards bounded, positions contiguous from 1, stable under repartition") {
    val df = (1L to 200L).toDF("doc_id")
    val plan = Sampling.shardPlan(df, "doc_id", 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(plan.length == 200)
    assert(plan.forall { case (_, s, _) => s >= 0 && s < 8 })
    plan.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq,
        "positions must be contiguous from 1 within each shard")
    }
    val replan = Sampling.shardPlan(df.repartition(7), "doc_id", 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(plan.toSet == replan.toSet, "plan must survive repartitioning")
  }

  test("mixtureSchedule: a permutation per shard; exact composition when " +
      "shares divide the batch; prefix deviation bounded; repartition-stable") {
    import spark.implicits._
    // 2 sources at exactly 3:1 within one shard → every full batch of
    // 4 must hold exactly (3, 1)
    val df = (1L to 400L).map(i =>
      (i, if (i % 4 == 0) "small" else "big")).toDF("doc_id", "src")
    val sched = Sampling.mixtureSchedule(df, "src", "doc_id",
      nShards = 1, batchSize = 4).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(sched.length == 400)
    assert(sched.map(_._4).sorted.toSeq == (1L to 400L).toSeq,
      "pos must be a permutation of the shard")
    sched.groupBy(_._5).foreach { case (b, rows) =>
      val comp = rows.groupBy(_._2).view.mapValues(_.length).toMap
      assert(comp == Map("big" -> 3, "small" -> 1),
        s"batch $b must replay the 3:1 mix exactly, got $comp")
    }
    // random-mix fixture: every prefix holds every source within
    // ±(nSources) of its proportional share (the simultaneous-tie
    // bound), across shards
    val mixed = (1L to 300L).map(i =>
      (i, s"s${(i * 2654435761L) % 5}")).toDF("doc_id", "src")
    val plan = Sampling.mixtureSchedule(mixed, "src", "doc_id",
      nShards = 2, batchSize = 8).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    plan.groupBy(_._2).foreach { case (shard, rows) =>
      val n = rows.length
      val bySource = rows.groupBy(_._1).view.mapValues(_.map(_._3).sorted).toMap
      val nSources = bySource.size
      for (m <- 1 to n) {
        bySource.foreach { case (src, positions) =>
          val got = positions.count(_ <= m)
          val want = m.toDouble * positions.length / n
          assert(math.abs(got - want) <= nSources + 1,
            s"shard $shard prefix $m source $src: $got vs $want")
        }
      }
    }
    // determinism under repartitioning (the shardPlan contract)
    val a = Sampling.mixtureSchedule(mixed, "src", "doc_id", 2, 8)
      .collect().map(_.toSeq).toSet
    val b = Sampling.mixtureSchedule(mixed.repartition(7), "src", "doc_id",
      2, 8).collect().map(_.toSeq).toSet
    assert(a == b, "the schedule must survive repartitioning")
  }

  test("neymanAllocation: exact sums, variance chases the budget, BigInt " +
      "model agreement, degenerate constant corpus") {
    import spark.implicits._
    // stratum "wild" has huge spread, "tame" is near-constant, both
    // the same size — Neyman must shift budget to wild
    val rows = (1L to 60L).map { i =>
      if (i <= 30) ("wild", if (i % 2 == 0) 1000L else 10L)
      else ("tame", 100L + (i % 2))
    }
    val got = Sampling.neymanAllocation(rows.toDF("src", "m"),
      "src", "m", 20L).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // BigInt model
    def isqrt(v: BigInt): BigInt = {
      var s = BigInt(math.sqrt(v.toDouble).toLong)
      while (s * s > v) s -= 1
      while ((s + 1) * (s + 1) <= v) s += 1
      s
    }
    val model = rows.groupBy(_._1).map { case (k, vs) =>
      val n = BigInt(vs.length)
      val st = vs.map(v => BigInt(v._2)).sum
      val st2 = vs.map(v => BigInt(v._2) * v._2).sum
      k -> ((n, n * st2 - st * st))
    }
    val w = model.view.mapValues { case (_, vn) => isqrt(vn) }.toMap
    got.foreach { case (k, (_, gw, _, _, _)) =>
      assert(BigInt(gw) === w(k), s"weight for $k")
    }
    assert(got.values.map(_._3).sum === 20L, "neyman sums to the budget")
    assert(got.values.map(_._4).sum === 20L, "prop sums to the budget")
    assert(got("wild")._3 > got("wild")._4,
      "the variable stratum must get MORE than proportional")
    // vr matches the model: (Σw)²·10⁶ / (N·Σ⌊varnum/n⌋)
    val sw = w.values.sum
    val nn = model.values.map(_._1).sum
    val tv = model.map { case (_, (n, vn)) => vn / n }.sum
    assert(BigInt(got("wild")._5) === sw * sw * 1000000 / (nn * tv))
    assert(got("wild")._5 < 800000L,
      "a genuinely skewed-variance corpus must show a real gap")
    // equal-variance strata: both designs agree on every stratum
    val eq = (1L to 40L).map(i => (s"s${i % 2}", i % 4))
      .toDF("src", "m")
    Sampling.neymanAllocation(eq, "src", "m", 10L).collect().foreach { r =>
      assert(r.getLong(3) === r.getLong(4),
        "equal variance ⇒ Neyman == proportional")
    }
    // degenerate constant corpus: every weight 0 → one unit per
    // stratum in stratum order, honest unspent remainder
    val const = (1L to 30L).map(i => (s"s${i % 3}", 7L)).toDF("src", "m")
    val deg = Sampling.neymanAllocation(const, "src", "m", 9L).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(deg.values.forall(_ == 1L),
      "zero variance everywhere ⇒ one sample per stratum")
  }

  test("neymanAllocation fails LOUDLY past the isqrt envelope instead of " +
      "silently nulling the weights") {
    import spark.implicits._
    // varnum for a 2-row stratum (v, 0) is v² — v = 4·10⁹ puts it at
    // 1.6·10¹⁹ > 2⁶², where the old bigint cast would have silently
    // produced null weights (and DuckDB's CAST would have errored:
    // divergent failure modes)
    val hot = Seq(("s", 4000000000L), ("s", 0L)).toDF("src", "m")
    val e = intercept[Exception] {
      Sampling.neymanAllocation(hot, "src", "m", 10L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("variance numerator")),
      s"expected the overflow guard, got: $e")
  }

  test("rendezvousShard: minimal disruption — movers go ONLY to the new shard") {
    val df = (1L to 400L).toDF("doc_id")
    val both = df.select(col("doc_id"),
        Sampling.rendezvousShard("doc_id", 8).as("s8"),
        Sampling.rendezvousShard("doc_id", 9).as("s9"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(both.forall { case (_, a, b) => a >= 0 && a < 8 && b >= 0 && b < 9 })
    // the HRW theorem: an argmax over a superset changes only when
    // the NEW candidate wins — every mover lands on shard 8
    both.filter { case (_, a, b) => a != b }.foreach { case (k, _, b) =>
      assert(b === 8, s"key $k moved to shard $b, not the new shard")
    }
    // the point of paying for HRW: a minority moves (~1/9), not ~all
    // (hash % N moves ~8/9 on the same transition)
    val moved = both.count { case (_, a, b) => a != b }
    assert(moved > 0 && moved < 400 / 4,
      s"expected ~1/9 of 400 keys to move, got $moved")
    // balanced-ish and deterministic under repartitioning
    assert(both.map(_._2).distinct.length === 8, "every shard is used")
    val re = df.repartition(7).select(col("doc_id"),
        Sampling.rendezvousShard("doc_id", 8).as("s8"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(re === both.map(t => (t._1, t._2)).toSet)
  }

  test("snmPairs: pair volume is bounded by windowSize per row") {
    val df = (1L to 40L).map(i => (i, s"prefix shared ${i % 7} tail"))
      .toDF("doc_id", "text")
    val n = Dedup.snmPairs(df, "doc_id", "text", blockPrefixLen = 4,
      windowSize = 3).count()
    assert(n <= 40L * 3)
  }

  test("snmPairsMultiPass: reversed-key pass recovers the prefix-edit pair fwd misses") {
    val df = Seq(
      // prefix edit, shared suffix: fwd blocks "alph"/"brav" never
      // meet; reversed keys share the "zz t" block and sort adjacent
      (1L, "alpha shared suffix content zz"),
      (2L, "bravo shared suffix content zz"),
      // suffix edit: fwd finds it, the reversed pass cannot
      (3L, "kilo echo one"),
      (4L, "kilo echo two")
    ).toDF("doc_id", "text")
    val fwdOnly = Dedup.snmPairs(df, "doc_id", "text")
      .select("doc_lo", "doc_hi").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(fwdOnly.toSet == Set((3L, 4L)),
      "single pass must miss the prefix-edited pair — that IS the blind spot")
    val multi = Dedup.snmPairsMultiPass(df, "doc_id", "text")
      .orderBy("doc_lo").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3),
        r.getLong(4), r.getBoolean(5)))
    assert(multi.toSeq == Seq(
      (1L, 2L, false, true, 0L, false),
      (3L, 4L, true, false, 0L, false)),
      "union of passes must strictly dominate the forward pass")
  }

  test("content-keyed split cannot straddle a duplicate; doc_id-keyed split can") {
    // ids 1 (hash bucket 60 → train) and 20 (bucket 96 → test) carry
    // IDENTICAL text: the doc_id keying puts the two copies in
    // different splits, the fp keying cannot
    val df = Seq((1L, "same exact text"), (20L, "same exact text"),
      (2L, "something else")).toDF("doc_id", "text")
    val d = df.select(col("doc_id"),
      Dedup.fingerprintOrEmpty(col("text")).as("fp"))
    def straddles(keyCol: String): Long =
      Sampling.hashSplit(d, keyCol, 90, 5)
        .groupBy(col("fp"))
        .agg(countDistinct(col("split")).as("nsp"))
        .filter(col("nsp") > 1).count()
    assert(straddles("doc_id") === 1L,
      "the planted duplicate must straddle under doc_id keying")
    assert(straddles("fp") === 0L,
      "one fp -> one hash -> one split: straddling is impossible")
  }

  test("normalizeUrl: case, www, ports, slash, fragment, tracking params, order") {
    val df = Seq(
      (1L, "HTTPS://WWW.Example.COM:443/A/b/?b=2&utm_source=x&a=1#frag"),
      (2L, "https://example.com/A/b?a=1&b=2"),
      (3L, "http://example.com:80/"),
      (4L, "http://example.com"),
      (5L, "https://example.com/p?utm_campaign=z&fbclid=abc"),
      (6L, "https://example.com:80/x"),
      (7L, "http://example.com:443/x"),
      (8L, "https://git.example.com/r?ref=main&a=1")
    ).toDF("doc_id", "url")
    val out = df.select(col("doc_id"), Dedup.normalizeUrl("url").as("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "https://example.com/A/b?a=1&b=2",
      "path case preserved; everything cosmetic canonicalized")
    assert(out(1L) === out(2L), "the two crawls must share one key")
    assert(out(3L) === "http://example.com")
    assert(out(3L) === out(4L), "default port + root slash are cosmetic")
    assert(out(5L) === "https://example.com/p",
      "tracking-only query must vanish entirely (no dangling '?')")
    assert(out(6L) === "https://example.com:80/x",
      ":80 under httpS is a DIFFERENT origin — the port must survive")
    assert(out(7L) === "http://example.com:443/x",
      ":443 under http is a DIFFERENT origin — the port must survive")
    assert(out(8L) === "https://git.example.com/r?a=1&ref=main",
      "ref= is frequently semantic (?ref=branch) — kept, only sorted")
  }

  test("wordNgrams: strict windows, no collapse below n") {
    val df = Seq((1L, "a b c d e"), (2L, "a b")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        TextAnalysis.tokens(col("text")).as("t"))
      .select(col("doc_id"), TextAnalysis.wordNgrams("t", 3).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) === Seq("a b c", "b c d", "c d e"))
    assert(out(2L) === Seq.empty, "short docs have NO n-grams, not a stub one")
  }

  test("snmPairs: maxBlockSize drops the hot block, spares the rest") {
    val df = Seq(
      (1L, "hot aaa"), (2L, "hot bbb"), (3L, "hot ccc"), // block size 3
      (10L, "cold x"), (11L, "cold y")                    // block size 2
    ).toDF("doc_id", "text")
    assert(Dedup.snmPairs(df, "doc_id", "text").count() == 4L)
    val capped = Dedup.snmPairs(df, "doc_id", "text", maxBlockSize = 2)
      .select("doc_lo", "doc_hi").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(capped.toSet == Set((10L, 11L)),
      "an overfull block must be dropped whole; small blocks untouched")
  }
}
