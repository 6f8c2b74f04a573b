package graft.temporal

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** Planted-fixture and brute-force tests for the interval-union
  * operator: half-open touch-merges, zero-length rows, the
  * close-before-open sweep tie rule, invalid-row drops, and a
  * randomized equivalence against a per-key axis scan.
  */
class IntervalsSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Long, Long)]) =
    Intervals.coverage(rows.toDF("k", "id", "s", "e"),
        col("k"), col("id"), col("s"), col("e"))
      .select(col("key"), col("n_intervals"), col("n_islands"),
        col("covered"), col("max_conc"))
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("touching intervals merge (half-open): [0,5) ∪ [5,8) = one island of 8") {
    val out = run(Seq((1L, 1L, 0L, 5L), (1L, 2L, 5L, 8L)))
    assert(out(1L) === ((2L, 1L, 8L, 1L))) // touch extends, never stacks
  }

  test("disjoint and nested intervals: coverage is the union, not the sum") {
    val out = run(Seq(
      (1L, 1L, 0L, 10L), (1L, 2L, 2L, 4L),   // nested: adds nothing
      (1L, 3L, 20L, 25L),                     // second island
      (2L, 4L, 0L, 3L)))
    assert(out(1L) === ((3L, 2L, 15L, 2L)))
    assert(out(2L) === ((1L, 1L, 3L, 1L)))
  }

  test("zero-length intervals: counted, zero coverage, zero concurrency") {
    val out = run(Seq((1L, 1L, 5L, 5L)))
    assert(out(1L) === ((1L, 1L, 0L, 0L)))
  }

  test("close-before-open at equal stamps: back-to-back never double-counts") {
    // [0,5) and [5,10): at t=5 the close is swept first, so peak is 1
    val out = run(Seq((1L, 1L, 0L, 5L), (1L, 2L, 5L, 10L), (1L, 3L, 2L, 4L)))
    assert(out(1L)._4 === 2L) // [0,5) overlaps [2,4) — peak 2, not 3
  }

  test("negative-length rows drop; a key with only invalid rows is absent") {
    val out = run(Seq((1L, 1L, 10L, 4L), (2L, 2L, 0L, 2L)))
    assert(!out.contains(1L))
    assert(out(2L) === ((1L, 1L, 2L, 1L)))
  }

  test("randomized: matches a brute-force axis scan per key") {
    val rnd = new scala.util.Random(43)
    val rows = (0 until 300).map { i =>
      val s = rnd.nextInt(100).toLong
      (rnd.nextInt(5).toLong, i.toLong, s, s + rnd.nextInt(12).toLong)
    }
    val got = run(rows)
    rows.groupBy(_._1).foreach { case (k, ivs) =>
      val covered = (0L until 120L).count(t => ivs.exists(v => v._3 <= t && t < v._4)).toLong
      val maxConc = (0L until 120L).map(t => ivs.count(v => v._3 <= t && t < v._4)).max.toLong
      val islands = {
        // standard definition: sort by start and scan, a new island
        // opens when start exceeds the running max end (touch merges)
        var prevEnd = Long.MinValue; var n = 0
        ivs.sortBy(v => (v._3, v._4, v._2)).foreach { v =>
          if (n == 0 || v._3 > prevEnd) n += 1
          prevEnd = math.max(prevEnd, v._4)
        }
        n
      }
      val g = got(k)
      assert(g._1 === ivs.length.toLong, s"n_intervals key $k")
      assert(g._3 === covered, s"covered key $k")
      assert(g._4 === maxConc, s"max_conc key $k")
      assert(g._2 === islands.toLong, s"n_islands key $k")
    }
  }

  test("plan: both passes window on the key — no global sort, no nested loop") {
    val df = Seq((1L, 1L, 0L, 5L)).toDF("k", "id", "s", "e")
    val plan = Intervals.coverage(df, col("k"), col("id"), col("s"), col("e"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan)
    assert(!plan.contains("rangepartitioning"),
      s"global sort leaked into the interval plan:\n$plan")
  }
}
