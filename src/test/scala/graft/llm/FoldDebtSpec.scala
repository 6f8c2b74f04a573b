package graft.llm

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[FoldDebt.schedule]] (q312's policy card): the running-sum /
  * generation arithmetic against an independent BigInt model, the
  * depth-only checkpoint cadence the constants promise (every 8 empty
  * folds at the default 125000 ppm depth charge), the tombstone-mass
  * rebuild trigger, chain-depth reset on generation advance, and
  * input-order independence (the window orders by epoch, not by
  * arrival order). */
class FoldDebtSpec extends AnyFunSuite with SparkTestSession {

  private def epochs(rows: (Long, Long, Long)*): DataFrame = {
    import spark.implicits._
    rows.toDF("epoch", "arrivals", "erases")
  }

  private def run(d: DataFrame,
      depthUnitPpm: Long = FoldDebt.DefaultDepthUnitPpm,
      tombWeight: Long = FoldDebt.DefaultTombWeight,
      debtBudgetPpm: Long = FoldDebt.DefaultDebtBudgetPpm,
      tombBudgetPpm: Long = FoldDebt.DefaultTombBudgetPpm) =
    FoldDebt.schedule(d, "epoch", "arrivals", "erases", depthUnitPpm,
        tombWeight, debtBudgetPpm, tombBudgetPpm)
      .orderBy("epoch").collect()

  /** Independent model of the whole schedule. */
  private def model(rows: Seq[(Long, Long, Long)],
      depthUnitPpm: Long = FoldDebt.DefaultDepthUnitPpm,
      tombWeight: Long = FoldDebt.DefaultTombWeight,
      debtBudgetPpm: Long = FoldDebt.DefaultDebtBudgetPpm,
      tombBudgetPpm: Long = FoldDebt.DefaultTombBudgetPpm)
      : Seq[(Long, Long, Long, Long, Long, Long, Long, Long, Long,
        String, Long)] = {
    var live = 0L; var cumDebt = 0L; var cumTomb = 0L
    var prevDg = 0L; var prevTg = 0L
    val depths = collection.mutable.Map.empty[(Long, Long), Long]
    rows.sortBy(_._1).map { case (e, arr, ers) =>
      live += arr - ers
      val tomb = ers * 1000000L / math.max(live, 1L)
      val debt = depthUnitPpm + arr * 1000000L / math.max(live, 1L) +
        tombWeight * tomb
      cumDebt += debt; cumTomb += tomb
      val dg = cumDebt / debtBudgetPpm
      val tg = cumTomb / tombBudgetPpm
      val action = if (tg > prevTg) "rebuild"
        else if (dg > prevDg) "checkpoint" else "fold"
      prevDg = dg; prevTg = tg
      val depth = depths.getOrElse((dg, tg), 0L) + 1L
      depths((dg, tg)) = depth
      (e, arr, ers, live, debt, cumDebt, dg, cumTomb, tg, action, depth)
    }
  }

  private def asTuples(rs: Array[org.apache.spark.sql.Row]) =
    rs.map(r => (r.getAs[Long]("epoch"), r.getAs[Long]("batch_rows"),
      r.getAs[Long]("erase_rows"), r.getAs[Long]("live_rows"),
      r.getAs[Long]("debt_ppm"), r.getAs[Long]("cum_debt_ppm"),
      r.getAs[Long]("debt_gen"), r.getAs[Long]("cum_tomb_ppm"),
      r.getAs[Long]("tomb_gen"), r.getAs[String]("action"),
      r.getAs[Long]("chain_depth"))).toSeq

  test("schedule equals the independent model on a mixed crawl") {
    val rows = Seq((0L, 1000L, 0L), (1L, 500L, 100L), (2L, 0L, 0L),
      (3L, 2000L, 400L), (4L, 100L, 300L), (5L, 0L, 150L),
      (6L, 800L, 0L), (7L, 50L, 10L))
    assert(asTuples(run(epochs(rows: _*))) === model(rows))
  }

  test("depth charge alone forces a checkpoint every 8 empty folds") {
    val rows = (0L until 17L).map(e => (e, 0L, 0L))
    val got = asTuples(run(epochs(rows: _*)))
    assert(got === model(rows))
    // cum_debt = (e+1)*125000: crosses 10^6 at epoch 7, 2*10^6 at 15
    assert(got.map(_._10) === Seq("fold", "fold", "fold", "fold", "fold",
      "fold", "fold", "checkpoint", "fold", "fold", "fold", "fold",
      "fold", "fold", "fold", "checkpoint", "fold"))
    // chain depth resets with the generation
    assert(got(6)._11 === 7L && got(7)._11 === 1L && got(14)._11 === 8L)
  }

  test("tombstone mass triggers REBUILD and rebuild subsumes checkpoint") {
    // epoch 1 erases 30% of live — tomb ppm 428571 > 250000 budget,
    // and the 4x tomb weight alone also crosses the debt budget: the
    // action must read rebuild, not checkpoint
    val rows = Seq((0L, 1000L, 0L), (1L, 0L, 300L))
    val got = asTuples(run(epochs(rows: _*)))
    assert(got === model(rows))
    assert(got(1)._10 === "rebuild")
    assert(got(1)._9 === 1L, "tomb_gen advanced")
  }

  test("input row order does not matter — the window orders by epoch") {
    val rows = Seq((3L, 10L, 0L), (0L, 100L, 0L), (2L, 0L, 50L),
      (1L, 40L, 0L))
    assert(asTuples(run(epochs(rows: _*))) === model(rows))
  }

  test("custom budgets are honored") {
    val rows = Seq((0L, 10L, 0L), (1L, 10L, 2L), (2L, 10L, 2L))
    val got = asTuples(run(epochs(rows: _*), depthUnitPpm = 0L,
      tombWeight = 1L, debtBudgetPpm = 500000L, tombBudgetPpm = 100000L))
    assert(got === model(rows, depthUnitPpm = 0L, tombWeight = 1L,
      debtBudgetPpm = 500000L, tombBudgetPpm = 100000L))
  }

  test("the step kernel unrolls to the windowed schedule — fold == window") {
    val rows = Seq((0L, 1000L, 0L), (1L, 500L, 100L), (2L, 0L, 0L),
      (3L, 2000L, 400L), (4L, 100L, 300L), (5L, 0L, 150L),
      (6L, 800L, 0L), (7L, 50L, 10L), (8L, 0L, 0L), (9L, 3000L, 900L))
    var st = FoldDebt.ZeroState
    val folded = rows.map { case (e, a, r) =>
      val (ns, row) = FoldDebt.step(st, "art", e, a, r)
      st = ns
      (row.epoch, row.batch_rows, row.erase_rows, row.live_rows,
        row.debt_ppm, row.cum_debt_ppm, row.debt_gen, row.cum_tomb_ppm,
        row.tomb_gen, row.action, row.chain_depth)
    }
    assert(asTuples(run(epochs(rows: _*))) === folded)
  }

  test("schedule rejects the feeds the step kernel rejects: duplicate " +
      "epochs and negative counts fail loudly, not nondeterministically") {
    // a duplicated epoch ties the ordered window — lag/row_number
    // over the tie would flip actions run to run; it must throw
    val dup = epochs((0L, 10L, 0L), (1L, 5L, 0L), (1L, 7L, 0L))
    val e1 = intercept[Exception] {
      FoldDebt.schedule(dup, "epoch", "arrivals", "erases").collect()
    }
    assert(e1.getMessage.contains("duplicate epoch") ||
      Option(e1.getCause).exists(_.getMessage.contains("duplicate epoch")))
    val neg = epochs((0L, 10L, 0L), (1L, 5L, -2L))
    val e2 = intercept[Exception] {
      FoldDebt.schedule(neg, "epoch", "arrivals", "erases").collect()
    }
    assert(e2.getMessage.contains("negative or null counts") ||
      Option(e2.getCause).exists(
        _.getMessage.contains("negative or null counts")))
  }

  test("the step kernel rejects regressed epochs and negative counts") {
    val (st, _) = FoldDebt.step(FoldDebt.ZeroState, "art", 5L, 10L, 0L)
    intercept[IllegalArgumentException] {
      FoldDebt.step(st, "art", 5L, 10L, 0L) // same epoch again
    }
    intercept[IllegalArgumentException] {
      FoldDebt.step(st, "art", 6L, -1L, 0L)
    }
  }

  test("invalid weights and budgets are rejected loudly") {
    val d = epochs((0L, 1L, 0L))
    intercept[IllegalArgumentException] {
      FoldDebt.schedule(d, "epoch", "arrivals", "erases",
        depthUnitPpm = -1L)
    }
    intercept[IllegalArgumentException] {
      FoldDebt.schedule(d, "epoch", "arrivals", "erases",
        debtBudgetPpm = 0L)
    }
  }
}
