package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[Bootstrap]]: the committed CDF thresholds re-derived, the mean-1
  * weight law on a real draw, CI behavior on a known statistic, and
  * determinism across runs. */
class BootstrapSpec extends AnyFunSuite with SparkTestSession {

  test("committed thresholds match a re-derived Poisson(1) CDF within 1") {
    // double-precision re-derivation; the committed values came from
    // 60-digit decimal, so agreement within ±1 ulp-of-grid certifies
    // transcription, and monotonicity + range certify shape
    val e1 = math.exp(-1.0)
    var term = 1.0; var cum = 0.0
    val expected = (0 until 8).map { k =>
      if (k > 0) term /= k
      cum += e1 * term
      math.floor(cum * 1e9).toLong
    }
    Bootstrap.PoissonCumPpb.zip(expected).zipWithIndex.foreach {
      case ((got, exp), k) =>
        assert(math.abs(got - exp) <= 1L, s"threshold k=$k: $got vs $exp")
    }
    assert(Bootstrap.PoissonCumPpb == Bootstrap.PoissonCumPpb.sorted)
    assert(Bootstrap.PoissonCumPpb.last < 1000000000L)
  }

  test("derived weights average 1 per replicate; CI brackets the truth") {
    import spark.implicits._
    // x = i % 7 → true mean 3.0 over a multiple-of-7 row count
    val n = 2100
    val df = (0 until n).map(i => (i.toLong, (i % 7).toLong))
      .toDF("id", "x")
    val reps = Bootstrap.replicateMeans(df, col("id"), col("x"), 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(reps.length === 64)
    assert(reps.map(_._1).toSet === (0L until 64L).toSet)
    // n_eff ~ Poisson(n): all replicates within 5 sigma of n
    val tol = (5 * math.sqrt(n)).toLong
    reps.foreach { case (rep, nEff, _) =>
      assert(math.abs(nEff - n) <= tol, s"rep $rep n_eff=$nEff")
    }
    // replicate means concentrate on 3000 mtok: the replicate grid
    // must bracket the truth and stay within ±10%
    val means = reps.map(_._3)
    assert(means.min <= 3000L && 3000L <= means.max,
      s"CI [${means.min}, ${means.max}] must bracket the true mean")
    means.foreach(m => assert(math.abs(m - 3000L) < 300L, s"mean $m"))
    // the spread is real (resampling actually happened)
    assert(means.distinct.length > 1)
  }

  test("deterministic: identical grids across runs and partitionings") {
    import spark.implicits._
    val df = (0 until 500).map(i => (i.toLong, (i * 13 % 50).toLong))
      .toDF("id", "x")
    def grid(d: org.apache.spark.sql.DataFrame) =
      Bootstrap.replicateMeans(d, col("id"), col("x"), 16)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    assert(grid(df) === grid(df.repartition(7)))
  }

  test("null stats count as weighted zeros, not dropped rows") {
    import spark.implicits._
    val df = Seq((1L, Some(10L)), (2L, None), (3L, Some(20L)))
      .toDF("id", "x")
    val reps = Bootstrap.replicateMeans(df, col("id"), col("x"), 8)
      .collect()
    // every replicate's n_eff draws from all 3 rows (w can be 0 by
    // chance, but the MAX over replicates reveals >2 contributors)
    assert(reps.map(_.getLong(1)).max >= 3L)
  }
}
