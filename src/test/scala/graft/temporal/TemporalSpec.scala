package graft.temporal

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** Planted-fixture semantics tests for the temporal join operators:
  * inclusive backward match, max-(ts, tie) tie-break, null on no
  * match, half-open range window, and bucket-boundary correctness.
  */
class TemporalSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("asofBackward picks the latest right row at or before each left ts") {
    val left = Seq((1L, 10L, 100L), (1L, 11L, 205L), (2L, 12L, 50L))
      .toDF("user", "id", "ts")
    val right = Seq((1L, 20L, 100L), (1L, 21L, 150L), (1L, 22L, 300L), (3L, 23L, 10L))
      .toDF("user", "id", "ts")
    val out = AsofJoin.asofBackward(left, right, Seq("user"), "ts", "id")
      .select(col("id"), col("asof.id").as("match_id"))
      .as[(Long, Option[Long])].collect().toMap
    assert(out(10L) === Some(20L)) // inclusive: right at exactly ts=100
    assert(out(11L) === Some(21L)) // 150 <= 205, 300 excluded
    assert(out(12L) === None)      // user 2 has no right rows
  }

  test("asofBackward tie-break: equal right timestamps resolve to max tie id") {
    val left = Seq((1L, 10L, 100L)).toDF("user", "id", "ts")
    val right = Seq((1L, 20L, 100L), (1L, 25L, 100L), (1L, 22L, 100L))
      .toDF("user", "id", "ts")
    val out = AsofJoin.asofBackward(left, right, Seq("user"), "ts", "id")
      .select(col("asof.id")).as[Long].collect()
    assert(out.toSeq === Seq(25L))
  }

  test("countPreceding: half-open window, zero-count rows kept, boundary exact") {
    val w = 100L
    val left = Seq((1L, 10L, 1000L), (1L, 11L, 1100L), (2L, 12L, 500L))
      .toDF("user", "id", "ts")
    // for left ts=1000, window is [900, 1000): 900 in, 999 in, 1000 out
    val right = Seq((1L, 900L), (1L, 999L), (1L, 1000L), (1L, 1050L), (3L, 950L))
      .toDF("user", "ts")
    val out = RangeJoin.countPreceding(left, right, Seq("user"), "ts", w)
      .select(col("id"), col("n_in_window")).as[(Long, Long)].collect().toMap
    assert(out(10L) === 2L) // 900 and 999
    assert(out(11L) === 2L) // [1000, 1100): 1000 and 1050
    assert(out(12L) === 0L) // user 2: nothing
  }

  test("asofBackward matches a brute-force scan on random data") {
    val rnd = new scala.util.Random(41)
    val lrows = (0 until 200).map(i => (rnd.nextInt(6).toLong, i.toLong, rnd.nextInt(500).toLong))
    val rrows = (0 until 200).map(i => (rnd.nextInt(6).toLong, (1000 + i).toLong, rnd.nextInt(500).toLong))
    val got = AsofJoin.asofBackward(
      lrows.toDF("user", "id", "ts"), rrows.toDF("user", "id", "ts"),
      Seq("user"), "ts", "id")
      .select(col("id"), col("asof.id").as("mid"))
      .as[(Long, Option[Long])].collect().toMap
    val want = lrows.map { case (u, id, ts) =>
      val cands = rrows.filter { case (u2, _, ts2) => u2 == u && ts2 <= ts }
      id -> (if (cands.isEmpty) None
             else Some(cands.maxBy { case (_, rid, rts) => (rts, rid) }._2))
    }.toMap
    assert(got == want)
  }

  test("burst composition: max trailing-window count includes the event itself") {
    // user 1: events at 0, 50, 99, 500 (window 100): counts-in-window
    // are 0, 1, 2, 0 → max_burst = 3 (the 99-event sees 0 and 50)
    val e = Seq((1L, 10L, 0L), (1L, 11L, 50L), (1L, 12L, 99L), (1L, 13L, 500L),
      (2L, 14L, 5L)).toDF("user", "id", "ts")
    val out = RangeJoin.countPreceding(
        e.select(col("id"), col("user"), col("ts")),
        e.select(col("user"), col("ts")), Seq("user"), "ts", 100L)
      .groupBy(col("user"))
      .agg((max(col("n_in_window")) + 1L).as("max_burst"))
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 3L, 2L -> 1L))
  }

  test("physical plans: range join is an equi-join, as-of join shuffles once") {
    import spark.implicits._
    val left = Seq((1L, 10L, 100L)).toDF("user", "id", "ts")
    val right = Seq((1L, 900L)).toDF("user", "ts")
    val rangePlan = RangeJoin.countPreceding(left, right, Seq("user"), "ts", 100L)
      .queryExecution.executedPlan.toString
    assert(!rangePlan.contains("NestedLoop"),
      s"range join fell back to a nested loop:\n$rangePlan")
    val asofPlan = AsofJoin.asofBackward(
      left, Seq((1L, 20L, 50L)).toDF("user", "id", "ts"), Seq("user"), "ts", "id")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(asofPlan).size
    assert(exchanges == 1, s"as-of join should shuffle exactly once, saw $exchanges")
  }

  test("internal working names never collide with caller columns") {
    // callers legitimately own "_ts"/"_side"/"_b" etc.; the operators
    // must neither misbind nor drop them
    val left = Seq((1L, 10L, 100L, "keep-l"), (1L, 11L, 205L, "keep-l2"))
      .toDF("user", "id", "ts", "_ts")
    val right = Seq((1L, 20L, 100L, 7L), (1L, 21L, 150L, 8L))
      .toDF("user", "id", "ts", "_side")
    val out = AsofJoin.asofBackward(left, right, Seq("user"), "ts", "id")
    assert(out.columns.contains("_ts")) // caller payload survives
    val rows = out.select(col("id"), col("_ts"), col("asof.id").as("mid"),
        col("asof._side").as("mside"))
      .as[(Long, String, Option[Long], Option[Long])].collect()
      .map(t => t._1 -> (t._2, t._3, t._4)).toMap
    assert(rows(10L) == ("keep-l", Some(20L), Some(7L)))
    assert(rows(11L) == ("keep-l2", Some(21L), Some(8L)))

    val rleft = Seq((1L, 10L, 1000L, "x")).toDF("user", "id", "ts", "_b")
    val rright = Seq((1L, 950L, "y"), (1L, 1000L, "z")).toDF("user", "ts", "_rts")
    val counts = RangeJoin.countPreceding(rleft, rright, Seq("user"), "ts", 100L)
    assert(counts.columns.contains("_b"))
    val got = counts.select(col("id"), col("_b"), col("n_in_window"))
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((10L, "x", 1L))) // 950 in [900,1000), 1000 excluded
  }

  test("countPreceding matches a brute-force inequality join on random data") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 400).map(i => (rnd.nextInt(5).toLong, i.toLong, rnd.nextInt(2000).toLong))
    val df = rows.toDF("user", "id", "ts")
    val got = RangeJoin.countPreceding(df, df.select(col("user"), col("ts")),
      Seq("user"), "ts", 150L)
      .select(col("id"), col("n_in_window")).as[(Long, Long)].collect().toMap
    val want = rows.map { case (u, id, ts) =>
      id -> rows.count { case (u2, _, ts2) => u2 == u && ts2 >= ts - 150L && ts2 < ts }.toLong
    }.toMap
    assert(got === want)
  }

  test("gap fill: dense axis per key, zeros flagged, null ts dropped") {
    val ts = java.sql.Timestamp.valueOf(_: String)
    val ev = Seq(
      ("a", ts("2024-01-01 00:10:00")),
      ("a", ts("2024-01-01 00:40:00")),
      ("a", ts("2024-01-01 03:05:00")), // hours 1,2 are gaps for a
      ("b", ts("2024-01-01 02:30:00")),
      ("b", null.asInstanceOf[java.sql.Timestamp]))
      .toDF("k", "ts")
    val got = GapFill.hourlyCounts(ev, "k", "ts")
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toString.take(13),
        r.getLong(2), r.getBoolean(3))).toSet
    assert(got === Set(
      ("a", "2024-01-01 00", 2L, false),
      ("a", "2024-01-01 01", 0L, true),
      ("a", "2024-01-01 02", 0L, true),
      ("a", "2024-01-01 03", 1L, false),
      ("b", "2024-01-01 00", 0L, true),
      ("b", "2024-01-01 01", 0L, true),
      ("b", "2024-01-01 02", 1L, false),
      ("b", "2024-01-01 03", 0L, true)))
  }

  test("gap fill: corrupt-timestamp span is refused; empty input returns empty") {
    val ts = java.sql.Timestamp.valueOf(_: String)
    val bad = Seq(("a", ts("1970-01-01 00:00:00")), ("a", ts("2024-01-01 00:00:00")))
      .toDF("k", "ts")
    val e = intercept[IllegalArgumentException] {
      GapFill.hourlyCounts(bad, "k", "ts", maxAxisHours = 1000L)
    }
    assert(e.getMessage.contains("time axis"))
    val empty = Seq.empty[(String, java.sql.Timestamp)].toDF("k", "ts")
    assert(GapFill.hourlyCounts(empty, "k", "ts").collect().isEmpty)
  }

  test("changePoint: planted level shift found at the exact boundary") {
    // type a: 10/day for days 0-9, then 30/day for days 10-19 — the
    // best split is after day 9 with means 10 and 30
    val a = (0L until 20L).map(d => ("a", d, if (d < 10) 10L else 30L))
    // type b: flat 5/day — every split shows shift 0; winner is the
    // EARLIEST day by the tie rule
    val b = (0L until 6L).map(d => ("b", d, 5L))
    val daily = (a ++ b).toDF("event_type", "day", "n")
    val got = graft.queries.TemporalQueries.changePoint(daily)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("a") === ((9L, 10L, 30L, 1000000L)),
      s"shift |30-10| over overall mean 20 = 1.0 → 1e6 ppm; got ${got("a")}")
    assert(got("b") === ((0L, 5L, 5L, 0L)))
    // a single-day series has no interior split: no row
    val single = Seq(("c", 0L, 7L)).toDF("event_type", "day", "n")
    assert(graft.queries.TemporalQueries.changePoint(single).collect().isEmpty)
  }
}
