package graft.llm

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.SparkTestSession

/** ScalaCheck for [[LabelQa.alphaCard]]: the lcm-scaled integer
  * spelling must equal a BigInt-FRACTION reference (exact rationals
  * through the coincidence-matrix route, then the signed-truncation
  * ppm rule) on ARBITRARY ratings — unbalanced designs, missing
  * raters, unpairable items — and on COMPLETE designs alpha must
  * satisfy the exact Fleiss reduction `1 − alpha = (1 − kappa) ·
  * (T − 1)/T` as a rational identity (cross-multiplied, no
  * rounding). */
object AlphaProps extends Properties("KrippendorffAlpha")
    with SparkTestSession {

  private val MaxRaters = 5

  private case class Frac(n: BigInt, d: BigInt) {
    require(d > 0, s"non-positive denominator $d")
    def +(o: Frac) = Frac(n * o.d + o.n * d, d * o.d)
    def -(o: Frac) = Frac(n * o.d - o.n * d, d * o.d)
    def *(o: Frac) = Frac(n * o.n, d * o.d)
    def /(o: Frac) = {
      val sign = if (o.n < 0) -1 else 1
      Frac(n * o.d * sign, d * o.n.abs)
    }
    def ===(o: Frac): Boolean = n * o.d == o.n * d
    /** The cards' rounding rule: truncate |·|·10⁶ toward zero, then
      * reapply the sign. Invariant under common factors, so the
      * unreduced fraction is fine. */
    def ppm: BigInt = {
      val v = n.abs * 1000000 / d
      if (n < 0) -v else v
    }
  }
  private val Zero = Frac(0, 1)
  private val One = Frac(1, 1)

  /** Exact-fraction Do/De/alpha over (item → labels given) — rater
    * identity collapses to label multiplicity, exactly what the
    * card's (item, label) cell sees. Coincidence-matrix route, not
    * the card's lcm-scaled spelling. */
  private def reference(items: Seq[Seq[String]])
      : (Long, Long, Long, BigInt, BigInt, BigInt) = {
    val per = items.map(ls => ls.groupBy(identity).view
      .mapValues(_.size.toLong).toMap)
    val pairable = per.filter(_.values.sum >= 2L)
    val t = BigInt(pairable.map(_.values.sum).sum)
    val doF =
      if (t == 0) Zero
      else pairable.map { m =>
        val ki = m.values.sum
        val disagree = ki * ki - m.values.map(v => v * v).sum
        Frac(BigInt(disagree), BigInt(ki - 1))
      }.foldLeft(Zero)(_ + _) / Frac(t, 1)
    val marg = pairable.flatten.groupBy(_._1).view
      .mapValues(_.map(_._2).sum).toMap
    val m2 = marg.values.map(v => BigInt(v) * BigInt(v)).sum
    val deF = if (t > 1) Frac(t * t - m2, t * (t - 1)) else Zero
    val alphaF =
      if (deF.n == 0) Zero // degenerate: the card reads zero
      else One - (doF / deF)
    (items.size.toLong, pairable.size.toLong,
      marg.keySet.size.toLong, doF.ppm, deF.ppm, alphaF.ppm)
  }

  private val itemsGen: Gen[List[List[String]]] = for {
    n <- Gen.choose(1, 14)
    items <- Gen.listOfN(n, for {
      // k = 1 is the unpairable case; k = 0 has no long-format row
      // and therefore does not exist to a ratings frame
      k <- Gen.choose(1, MaxRaters)
      ls <- Gen.listOfN(k, Gen.oneOf("en", "no", "de", "(abstain)"))
    } yield ls)
  } yield items

  property("card == BigInt-fraction reference on arbitrary " +
      "(unbalanced, partly unpairable) designs") =
    forAll(itemsGen) { items =>
      import spark.implicits._
      val rows = items.zipWithIndex.flatMap { case (ls, i) =>
        ls.zipWithIndex.map { case (l, r) => (i.toLong, s"r$r", l) }
      }
      if (rows.isEmpty) true // toDF of an empty Seq has no schema rows
      else {
        val (ni, np, nc, doP, deP, aP) = reference(items)
        val row = LabelQa.alphaCard(rows.toDF("item", "rater", "lab"),
          "item", "rater", "lab", MaxRaters).collect().head
        val got = (row.getAs[Long]("n_items"),
          row.getAs[Long]("n_pairable"), row.getAs[Long]("n_classes"),
          BigInt(row.getAs[Long]("do_ppm")),
          BigInt(row.getAs[Long]("de_ppm")),
          BigInt(row.getAs[Long]("alpha_ppm")))
        val want = (ni, np, nc, doP, deP, aP)
        val same = got == want
        if (!same) println(s"MISMATCH items=$items got=$got want=$want")
        same
      }
    }

  private val completeGen: Gen[(Int, List[List[String]])] = for {
    k <- Gen.choose(2, MaxRaters)
    n <- Gen.choose(1, 12)
    items <- Gen.listOfN(n,
      Gen.listOfN(k, Gen.oneOf("en", "no", "de")))
  } yield (k, items)

  property("on complete designs: 1 - alpha == (1 - fleiss) * (T-1)/T " +
      "as an exact rational identity") =
    forAll(completeGen) { case (k, items) =>
      // shrinking does not preserve the complete-design invariant
      if (items.isEmpty || items.exists(_.size != k)) true
      else completeIdentity(k, items)
    }

  private def completeIdentity(k: Int, items: List[List[String]])
      : Boolean = {
      val per = items.map(ls => ls.groupBy(identity).view
        .mapValues(_.size.toLong).toMap)
      val t = BigInt(items.size.toLong) * k
      val a = per.map(_.values.map(v => BigInt(v) * v).sum).sum
      val p = BigInt(items.size.toLong) * k * (k - 1)
      val marg = per.flatten.groupBy(_._1).view
        .mapValues(_.map(_._2).sum).toMap
      val m2 = marg.values.map(v => BigInt(v) * BigInt(v)).sum
      if (t * t == m2) true // single-class: both estimators read zero
      else {
        // Fleiss as an exact fraction (the q308 integer spelling's
        // rational): kappa = ((A−T)·T² − M2·P) / (P·(T² − M2))
        val kappa = Frac((a - t) * t * t - m2 * p, p * (t * t - m2))
        val alpha = {
          val don = per.map { m =>
            val ki = m.values.sum
            BigInt(ki * ki - m.values.map(v => v * v).sum)
          }.sum
          val doF = Frac(don, BigInt(k - 1)) / Frac(t, 1)
          val deF = Frac(t * t - m2, t * (t - 1))
          One - (doF / deF)
        }
        (One - alpha) === ((One - kappa) * Frac(t - 1, t))
      }
  }
}
