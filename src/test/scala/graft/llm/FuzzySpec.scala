package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Edit-distance join: blocking completeness vs brute force, band
  * boundary cases, and the null contract. */
class FuzzySpec extends AnyFunSuite with SparkTestSession {

  private def df(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("id", "name")
  }

  /** Reference Levenshtein for the brute-force check. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("matches brute force on a pseudo-random corpus, pairs exactly once") {
    val alphabet = "abcde"
    def word(seed: Long): String = {
      val len = 2 + (seed % 7).toInt
      (0 until len).map(i => alphabet(((seed * 31 + i * 17) % 5).toInt)).mkString
    }
    val left = (0L until 40L).map(i => (i, word(i)))
    val right = (0L until 40L).map(i => (1000L + i, word(i * 3 + 1)))
    val got = Fuzzy.editDistanceJoin(df(left: _*), df(right: _*), maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length === got.toSet.size, "a pair was emitted twice")
    val expected = (for {
      (ia, na) <- left; (ib, nb) <- right
      d = lev(na, nb) if d <= 2
    } yield (ia, ib, d.toLong)).toSet
    assert(got.toSet === expected)
    assert(expected.nonEmpty)
  }

  test("pairs straddling a band boundary are found") {
    // maxDist=1 → band width 2: "ab" (len 2, band 1) vs "abc"
    // (len 3, band 1) vs "abcd" (len 4, band 2): the (abc, abcd) pair
    // crosses bands and must still surface via the neighbor probe
    val got = Fuzzy.editDistanceJoin(
      df((1L, "abc")), df((2L, "abcd"), (3L, "ab"), (4L, "xyz")), maxDist = 1)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((2L, 1L), (3L, 1L)))
  }

  test("maxDist=0 degenerates to an exact join; nulls drop out") {
    val got = Fuzzy.editDistanceJoin(
      df((1L, "same"), (2L, "other"), (3L, null)),
      df((10L, "same"), (11L, null)), maxDist = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 10L)))
  }
}
