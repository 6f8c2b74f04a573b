package graft.llm

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[Drift]]: critical values re-derived from the incomplete gamma,
  * the exact-rational term arithmetic vs an independent BigInt model,
  * planted-drift detection, and the no-baseline/no-arrival edges. */
class DriftSpec extends AnyFunSuite with SparkTestSession {

  private def df(rows: (String, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("src", "cell")
  }

  private def card(arr: DataFrame, cor: DataFrame) =
    Drift.chiSquareCard(arr, cor, "src", "cell").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getBoolean(7)))).toMap

  test("committed 95% critical values match the incomplete gamma within 2") {
    // regularized lower incomplete gamma via series (x < a+1 never
    // holds at these quantiles, so use the 1 - CF upper form)
    def chi2Cdf(x: Double, k: Int): Double = {
      val a = k / 2.0
      val lg = {
        // Lanczos lgamma
        val g = Seq(676.5203681218851, -1259.1392167224028,
          771.32342877765313, -176.61502916214059, 12.507343278686905,
          -0.13857109526572012, 9.9843695780195716e-6,
          1.5056327351493116e-7)
        def lgamma(z: Double): Double = {
          if (z < 0.5)
            math.log(math.Pi / math.sin(math.Pi * z)) - lgamma(1 - z)
          else {
            val zz = z - 1
            val base = zz + 7.5
            val s = 0.99999999999980993 + g.zipWithIndex.map {
              case (c, i) => c / (zz + i + 1)
            }.sum
            0.5 * math.log(2 * math.Pi) + (zz + 0.5) * math.log(base) -
              base + math.log(s)
          }
        }
        lgamma(a)
      }
      val xx = x / 2.0
      if (xx < a + 1) {
        var term = 1.0 / a; var s = term; var n = a
        while (math.abs(term) > math.abs(s) * 1e-15) {
          n += 1; term *= xx / n; s += term
        }
        s * math.exp(-xx + a * math.log(xx) - lg)
      } else {
        var b = xx + 1 - a; var c = 1e300; var d = 1 / b; var h = d
        var i = 1
        var de = 0.0
        do {
          val an = -i * (i - a)
          b += 2
          d = an * d + b; if (math.abs(d) < 1e-300) d = 1e-300
          c = b + an / c; if (math.abs(c) < 1e-300) c = 1e-300
          d = 1 / d
          de = d * c
          h *= de
          i += 1
        } while (math.abs(de - 1) > 1e-15 && i < 500)
        1 - math.exp(-xx + a * math.log(xx) - lg) * h
      }
    }
    Drift.Chi2Crit95Ppm.zipWithIndex.foreach { case (crit, i) =>
      val dfree = i + 1
      // bisect the CDF to the 95% quantile
      var lo = 0.0; var hi = 100.0
      (0 until 100).foreach { _ =>
        val mid = (lo + hi) / 2
        if (chi2Cdf(mid, dfree) < 0.95) lo = mid else hi = mid
      }
      val expect = ((lo + hi) / 2 * 1e6).toLong
      assert(math.abs(crit - expect) <= 2, s"df=$dfree: $crit vs $expect")
    }
    assert(Drift.Chi2Crit95Ppm == Drift.Chi2Crit95Ppm.sorted)
  }

  test("terms match an independent BigInt model") {
    val arr = df(("s", "a"), ("s", "a"), ("s", "b"), ("s", "c"))
    val cor = df(Seq.fill(10)(("s", "a")) ++ Seq.fill(10)(("s", "b")): _*)
    val got = card(arr, cor)("s")
    // cells: a (o=2,c=10), b (o=1,c=10), c (o=1,c=0); A=4, C=20, K=3
    def term(o: Long, c: Long): Long =
      (BigInt(1000000) * BigInt(o * 23 - 4 * (c + 1)).pow(2) /
        (BigInt(4) * BigInt(c + 1) * BigInt(23))).toLong
    val want = term(2, 10) + term(1, 10) + term(1, 0)
    assert(got === ((4L, 20L, 3L, 2L, want, 5991464L, want > 5991464L)))
  }

  test("planted language flip drifts; unbiased cut does not") {
    val cor = df((0 until 300).map(i =>
      ("s", if (i % 3 == 0) "en" else "de")): _*)
    // unbiased arrivals: same 1/3-2/3 mix
    val fair = df((0 until 90).map(i =>
      ("s", if (i % 3 == 0) "en" else "de")): _*)
    assert(!card(fair, cor)("s")._7, "an unbiased cut must not drift")
    // flipped arrivals: all en
    val flipped = df((0 until 90).map(_ => ("s", "en")): _*)
    val d = card(flipped, cor)("s")
    assert(d._7, s"a full language flip must drift (chi2=${d._5})")
    assert(d._5 > 10 * d._6, "the flip reads far past the threshold")
  }

  test("chiSquarePivot == chiSquareCard on in-list values, and with " +
      "one unseen value lumped to OTHER") {
    val cor = df((0 until 120).map(i =>
      (s"s${i % 3}", if (i % 3 == 0) "en" else if (i % 2 == 0) "de"
       else "fr")): _*)
    val arr = df((0 until 40).map(i =>
      (s"s${i % 3}", if (i % 5 == 0) "en" else "de")): _*)
    def shape(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7))).toSet
    val cells = Seq("en", "de", "fr")
    assert(shape(Drift.chiSquarePivot(arr, cor, "src", "cell", cells)) ===
      shape(Drift.chiSquareCard(arr, cor, "src", "cell")),
      "in-list pivot must equal the card")
    // one value outside the config list on each side: the pivot's
    // OTHER bucket carries exactly that cell, so equality holds
    val arr2 = arr.unionByName(df(("s0", "xx"), ("s1", "xx")))
    val cor2 = cor.unionByName(df(("s0", "xx")))
    assert(shape(Drift.chiSquarePivot(arr2, cor2, "src", "cell", cells)) ===
      shape(Drift.chiSquareCard(arr2, cor2, "src", "cell")),
      "a single unseen value must lump losslessly")
    // zero-arrival groups are the documented difference: silent in
    // the pivot, chi2 = 0 rows in the card
    val corOnly = cor.unionByName(df(("ghost", "en")))
    val pivotRows = Drift.chiSquarePivot(arr, corOnly, "src", "cell", cells)
      .collect().map(_.getString(0)).toSet
    assert(!pivotRows.contains("ghost"))
  }

  test("edge groups: no arrivals reads zero; a new source stays finite") {
    val arr = df(("new", "en"), ("new", "en"))
    val cor = df(("old", "en"), ("old", "de"))
    val got = card(arr, cor)
    assert(got("old")._5 === 0L, "no arrivals => chi2 0")
    assert(!got("old")._7)
    assert(got("new")._2 === 0L, "new source has no corpus baseline")
    assert(!got("new")._7, "pure smoothing cannot drift a 1-cell group")
  }
}
