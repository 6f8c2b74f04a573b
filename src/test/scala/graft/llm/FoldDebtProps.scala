package graft.llm

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.SparkTestSession

/** ScalaCheck: [[FoldDebt.schedule]]'s window arithmetic equals the
  * pure [[FoldDebt.step]] recurrence on ARBITRARY crawls and budgets
  * — the fold ≡ window contract the streaming meter stands on, pinned
  * universally instead of on hand-picked fixtures. Generators produce
  * the hard shapes: empty batches, erase-heavy epochs that drive the
  * live count toward (and past) zero, degenerate zero depth charge,
  * and budgets small enough that generations advance on most rows. */
object FoldDebtProps extends Properties("FoldDebt") with SparkTestSession {

  private case class Fixture(rows: List[(Long, Long, Long)],
      depthUnitPpm: Long, tombWeight: Long, debtBudgetPpm: Long,
      tombBudgetPpm: Long, initialLive: Long)

  private val fixtureGen: Gen[Fixture] = for {
    n <- Gen.choose(1, 24)
    arrivals <- Gen.listOfN(n, Gen.oneOf(Gen.const(0L),
      Gen.choose(0L, 5000L)))
    erases <- Gen.listOfN(n, Gen.oneOf(Gen.const(0L),
      Gen.choose(0L, 3000L)))
    depthUnit <- Gen.oneOf(0L, 1L, 125000L, 400000L)
    tombWeight <- Gen.choose(0L, 8L)
    debtBudget <- Gen.oneOf(1L, 200000L, 1000000L, 3000000L)
    tombBudget <- Gen.oneOf(1L, 100000L, 250000L, 900000L)
    // a pre-existing corpus (the compacted-generation seed) must
    // price relative mass identically in both spellings
    initialLive <- Gen.oneOf(0L, 1L, 500L, 250000L)
  } yield Fixture(
    arrivals.zip(erases).zipWithIndex
      .map { case ((a, e), i) => (i.toLong, a, e) },
    depthUnit, tombWeight, debtBudget, tombBudget, initialLive)

  property("schedule (window) == step (fold), row for row, on " +
      "arbitrary crawls and budgets") =
    forAll(fixtureGen) { f =>
      import spark.implicits._
      val windowed = FoldDebt.schedule(
          f.rows.toDF("epoch", "arrivals", "erases"), "epoch",
          "arrivals", "erases", f.depthUnitPpm, f.tombWeight,
          f.debtBudgetPpm, f.tombBudgetPpm, f.initialLive)
        .orderBy("epoch").collect().map(r =>
          (r.getAs[Long]("epoch"), r.getAs[Long]("batch_rows"),
            r.getAs[Long]("erase_rows"), r.getAs[Long]("live_rows"),
            r.getAs[Long]("debt_ppm"), r.getAs[Long]("cum_debt_ppm"),
            r.getAs[Long]("debt_gen"), r.getAs[Long]("cum_tomb_ppm"),
            r.getAs[Long]("tomb_gen"), r.getAs[String]("action"),
            r.getAs[Long]("chain_depth"))).toSeq
      var st = FoldDebt.startState(f.initialLive)
      val folded = f.rows.map { case (e, a, r) =>
        val (ns, row) = FoldDebt.step(st, "art", e, a, r,
          f.depthUnitPpm, f.tombWeight, f.debtBudgetPpm, f.tombBudgetPpm)
        st = ns
        (row.epoch, row.batch_rows, row.erase_rows, row.live_rows,
          row.debt_ppm, row.cum_debt_ppm, row.debt_gen,
          row.cum_tomb_ppm, row.tomb_gen, row.action, row.chain_depth)
      }
      val same = windowed == folded
      if (!same) println(s"MISMATCH fixture=$f\n window=$windowed\n fold=$folded")
      same
    }
}
