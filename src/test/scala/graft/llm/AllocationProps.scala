package graft.llm

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.SparkTestSession

/** ScalaCheck: the closed-form water-fill satisfies the fair-share
  * contract for arbitrary caps and budgets — the invariants the q199
  * oracle replays and a training-data buyer relies on. */
object AllocationProps extends Properties("Allocation") with SparkTestSession {

  private val capsGen: Gen[List[(String, Long)]] = for {
    n <- Gen.choose(1, 30)
    caps <- Gen.listOfN(n, Gen.choose(0L, 2000L))
  } yield caps.zipWithIndex.map { case (c, i) => (f"s$i%02d", c) }

  private val budgetGen: Gen[Long] = Gen.choose(0L, 40000L)

  property("sum = min(budget, total); caps respected; cut is a prefix") =
    forAll(capsGen, budgetGen) { (caps, budget) =>
      import spark.implicits._
      val rows = Sampling.cappedAllocation(
          caps.toDF("source", "cap_tokens"), "source", "cap_tokens", budget)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      val total = caps.map(_._2).sum
      val byKey = rows.map(r => r._1 -> r).toMap
      val sumOk = rows.map(_._3).sum == math.min(budget, total)
      val capOk = rows.forall(r => r._3 >= 0L && r._3 <= r._2)
      val satOk = rows.forall(r => !r._4 || r._3 == r._2)
      // saturation is monotone in cap: if a key saturated, every key
      // with a strictly smaller cap saturated too
      val minUnsatCap =
        rows.filter(!_._4).map(_._2).sorted.headOption.getOrElse(Long.MaxValue)
      val prefixOk = rows.filter(_._4).forall(_._2 <= minUnsatCap)
      // unsaturated keys share a level: allocations differ by ≤ 1
      val unsat = rows.filter(!_._4).map(_._3)
      val levelOk = unsat.isEmpty || (unsat.max - unsat.min) <= 1L
      sumOk && capOk && satOk && prefixOk && levelOk &&
        rows.length == caps.length && byKey.size == caps.length
    }
}
