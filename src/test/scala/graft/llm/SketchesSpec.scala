package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** Tests for the mergeable sketches: HLL register arithmetic against a
  * Scala replay, estimate quality on a known-cardinality set, the CM
  * one-sided guarantee, and plan shape (counters never shuffle keys).
  */
class SketchesSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def md5h32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
  }

  test("hllDistinctCard replays the register arithmetic exactly") {
    val keys = (1 to 400).map(i => ("g1", s"key$i")) ++
      (1 to 50).map(i => ("g2", s"other$i"))
    val got = Sketches.hllDistinctCard(keys.toDF("g", "k"), col("g"), col("k"))
      .select(col("group_key"), col("n_exact"), col("hll_est"), col("err_ppm"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // Scala replay of the identical integer estimator
    def replay(ks: Seq[String]): Long = {
      val regs = Array.fill(64)(0L)
      ks.distinct.foreach { k =>
        val h = md5h32(k); val b = (h % 64).toInt; val r = h / 64
        val rho = if (r == 0) 27L
          else 27L - (64 - java.lang.Long.numberOfLeadingZeros(r))
        regs(b) = math.max(regs(b), rho)
      }
      val s = regs.map(mr => 1L << (27 - mr)).sum
      (709L * 64 * 64 * (1L << 27)) / (1000L * s)
    }
    assert(got("g1")._1 === 400L)
    assert(got("g1")._2 === replay(keys.filter(_._1 == "g1").map(_._2)))
    assert(got("g2")._1 === 50L)
    assert(got("g2")._2 === replay(keys.filter(_._1 == "g2").map(_._2)))
    // raw HLL at m=64 has ~13% relative error; sanity-bound the card
    assert(got("g1")._3 < 400000L, s"estimate off by ${got("g1")._3} ppm")
  }

  test("duplicate keys do not move HLL registers") {
    val once = Sketches.hllDistinctCard(
        Seq(("g", "a"), ("g", "b")).toDF("g", "k"), col("g"), col("k"))
      .select(col("hll_est")).as[Long].collect().head
    val dup = Sketches.hllDistinctCard(
        Seq(("g", "a"), ("g", "a"), ("g", "b"), ("g", "b")).toDF("g", "k"),
        col("g"), col("k"))
      .select(col("hll_est")).as[Long].collect().head
    assert(once === dup)
  }

  test("cmsHeavyHitters: estimates are exact in a collision-free sketch") {
    // tiny vocab, wide sketch → no collisions → n_est == n_exact
    val docs = Seq((1L, "a a a b"), (2L, "a b c"), (3L, "c c d"))
      .toDF("doc_id", "text")
    val out = Sketches.cmsHeavyHitters(docs, "doc_id", "text", 4096, 10)
      .select(col("w"), col("n_exact"), col("n_est"), col("overcount"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(out === Set(("a", 4L, 4L, 0L), ("b", 2L, 2L, 0L),
      ("c", 3L, 3L, 0L), ("d", 1L, 1L, 0L)))
  }

  test("cmsHeavyHitters: one-sided guarantee under forced collisions") {
    val rnd = new scala.util.Random(53)
    val docs = (1L to 40L).map(i =>
      i -> Seq.fill(20)(s"w${rnd.nextInt(200)}").mkString(" "))
      .toDF("doc_id", "text")
    // width 8 → heavy collisions; estimate must never undercount
    val out = Sketches.cmsHeavyHitters(docs, "doc_id", "text", 8, 20)
      .select(col("overcount")).as[Long].collect()
    assert(out.nonEmpty && out.forall(_ >= 0L))
  }

  test("plan: CM counters aggregate on (row, bucket) — raw tokens never join") {
    val docs = Seq((1L, "x y z")).toDF("doc_id", "text")
    val plan = Sketches.cmsHeavyHitters(docs, "doc_id", "text", 512, 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.contains("NestedLoop"), plan)
    assert(plan.contains("BroadcastHashJoin"),
      s"counter probe should broadcast the 2048-cell counter table:\n$plan")
  }

  test("hllUnionCard: max-merged group sketches equal the direct sketch") {
    import spark.implicits._
    // overlapping groups: 0..149 in g0, 100..249 in g1 — the union
    // estimate must see 250 distinct keys once, not 300
    val rows = (0 until 150).map(i => ("g0", s"k$i")) ++
      (100 until 250).map(i => ("g1", s"k$i"))
    val df = rows.toDF("g", "k")
    val card = Sketches.hllUnionCard(df, col("g"), col("k")).collect().head
    assert(card.getLong(0) === 250L)
    assert(card.getLong(1) === card.getLong(2),
      "merged and direct estimates must agree bit-for-bit")
    assert(card.getBoolean(3), "merge_exact certifies the algebra")
    // and the union estimate is the raw-HLL ballpark, not garbage
    val est = card.getLong(1)
    assert(est > 150L && est < 500L, s"estimate $est implausible for 250 keys")
    // splitting the SAME corpus differently cannot change the union
    val resplit = df.withColumn("g",
      when(length(col("k")) % 2 === 0, "a").otherwise("b"))
    val card2 = Sketches.hllUnionCard(resplit, col("g"), col("k"))
      .collect().head
    assert(card2.getLong(1) === est, "union estimate is split-invariant")
  }

  test("mergeRegisters: split-any-way merge equals the direct sketch, parquet round trip included") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = (1 to 300).map(i => (s"g${i % 3}", s"k${i % 97}"))
    val df = rows.toDF("g", "k")
    def regsOf(d: org.apache.spark.sql.DataFrame) =
      Sketches.hllRegisters(d, col("g"), col("k"))
    def regSet(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val direct = regSet(regsOf(df))
    // any split of the rows max-merges back to the direct registers
    val (a, b) = rows.partition(_._2.hashCode % 2 == 0)
    val merged = Sketches.mergeRegisters(
      regsOf(a.toDF("g", "k")), regsOf(b.toDF("g", "k")))
    assert(regSet(merged) === direct)
    // and the monoid survives a parquet round trip (the q246 contract)
    val tmp = java.nio.file.Files.createTempDirectory("regs").toString
    regsOf(a.toDF("g", "k")).write.mode("overwrite").parquet(s"$tmp/a")
    val loaded = spark.read.parquet(s"$tmp/a")
    assert(regSet(Sketches.mergeRegisters(loaded, regsOf(b.toDF("g", "k"))))
      === direct)
  }

  test("integrityCard: commutative, duplicate-sensitive, boundary-proof") {
    def cardOf(df: org.apache.spark.sql.DataFrame) =
      Sketches.integrityCard(df, col("g"),
          Seq(col("a"), coalesce(col("b"), lit(""))))
        .as[(String, Long, Long, Long, Long, Long)]
        .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    val rows = Seq(("s1", "ab", Some("c")), ("s1", "a", Some("bc")),
      ("s1", "x", None), ("s2", "y", Some("z")))
    val base = cardOf(rows.toDF("g", "a", "b"))
    // row order and partitioning cannot move the card
    assert(cardOf(rows.reverse.toDF("g", "a", "b").repartition(5)) === base)
    // "ab"+"c" and "a"+"bc" are DIFFERENT rows (delimited fields)
    assert(base("s1")._2 === 3L, "field boundaries must disambiguate")
    // a duplicated row changes n_rows but not n_distinct_rows
    val dup = cardOf((rows :+ (("s1", "x", Option.empty[String])))
      .toDF("g", "a", "b"))
    assert(dup("s1")._1 === base("s1")._1 + 1)
    assert(dup("s1")._2 === base("s1")._2)
    // one flipped character anywhere flips the checksum
    val flipped = cardOf(Seq(("s1", "ab", Some("c")), ("s1", "a", Some("bc")),
      ("s1", "X", None), ("s2", "y", Some("z"))).toDF("g", "a", "b"))
    assert(flipped("s1")._3 !== base("s1")._3)
    assert(flipped("s2") === base("s2"), "untouched groups keep their card")
    // the Scala md5 replay pins the sum arithmetic
    val expect = Seq("ab\u0001c", "a\u0001bc", "x\u0001")
      .map(md5h32).sum % Sketches.ChecksumMod
    assert(base("s1")._3 === expect)
  }

  test("mergeCounters: split-any-way cell sum equals the direct grid, parquet round trip included") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = (1 to 400).map(i => s"tok${i % 53}")
    def ctrOf(ws: Seq[String]) =
      Sketches.cmCounters(ws.toDF("w"), width = 64)
    def cells(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val direct = cells(ctrOf(rows))
    val (a, b) = rows.zipWithIndex.partition(_._2 % 3 == 0)
    val merged = Sketches.mergeCounters(ctrOf(a.map(_._1)), ctrOf(b.map(_._1)))
    assert(cells(merged) === direct)
    // the monoid survives a parquet round trip (the q263 contract)
    val tmp = java.nio.file.Files.createTempDirectory("ctr").toString
    ctrOf(a.map(_._1)).write.mode("overwrite").parquet(s"$tmp/a")
    assert(cells(Sketches.mergeCounters(
      spark.read.parquet(s"$tmp/a"), ctrOf(b.map(_._1)))) === direct)
  }

  test("log2Histogram: bucket law, slice-merge == direct, quantile containment") {
    val rnd = new scala.util.Random(2026)
    val values = Seq.fill(400)(rnd.nextInt(1 << rnd.nextInt(14)).toLong)
    val df = values.zipWithIndex
      .map { case (v, i) => (if (i % 3 == 0) "a" else "b", v, i.toLong) }
      .toDF("g", "n", "id")
    val hist = Sketches.log2Histogram(df, col("g"), col("n"))
      .as[(String, Int, Long)].collect()
    // bucket = binary digit count, and counts add up
    assert(hist.map(_._3).sum === 400L)
    hist.foreach { case (_, b, _) =>
      assert(b >= 1 && b <= 14, s"bucket $b out of the value range") }
    values.foreach { v =>
      assert(java.lang.Long.toBinaryString(v).length ===
        (if (v == 0) 1 else 64 - java.lang.Long.numberOfLeadingZeros(v)))
    }
    // histograms from disjoint slices merge by bucket-sum to the direct one
    val slices = Seq(df.filter(col("id") % 2 === 0), df.filter(col("id") % 2 === 1))
      .map(Sketches.log2Histogram(_, col("g"), col("n")))
    val merged = slices.reduce(_ unionByName _)
      .groupBy(col("g"), col("bucket")).agg(sum(col("cnt")).as("cnt"))
      .as[(String, Int, Long)].collect().toSet
    assert(merged === hist.toSet)
    // estimate lands in the same bucket as the exact rank statistic
    val totals = df.groupBy(col("g")).agg(count(lit(1)).as("n_docs"))
    for (p <- Seq(10, 50, 90, 100)) {
      val est = Sketches.histQuantile(
        Sketches.log2Histogram(df, col("g"), col("n")), totals, p)
        .as[(String, Long)].collect().toMap
      val byG = values.zipWithIndex
        .groupBy { case (_, i) => if (i % 3 == 0) "a" else "b" }
      byG.foreach { case (g, vs) =>
        val sorted = vs.map(_._1).sorted
        val exact = sorted((vs.size * p + 99) / 100 - 1)
        def bucket(v: Long) = java.lang.Long.toBinaryString(v).length
        assert(bucket(est(g)) === bucket(exact),
          s"p$p group $g: est ${est(g)} not in exact's bucket ($exact)")
      }
    }
  }
}
