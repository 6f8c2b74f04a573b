package graft.llm

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.SparkTestSession

/** ScalaCheck for [[LabelQa.alphaWeightedCard]] (r18 verdict ask #8):
  * the dataflow spelling must equal a BigInt replay of the integer
  * formulas on ARBITRARY designs for BOTH metrics (the ordinal
  * weights are data-derived from the coincidence marginals), and on a
  * BINARY scale both metrics must reduce EXACTLY to the nominal
  * [[LabelQa.alphaCard]] — the single off-diagonal weight cancels
  * from every floor-ppm ratio. Sample count is capped: each sample
  * executes the full multi-join card plan. */
object AlphaWeightedProps extends Properties("KrippendorffAlphaWeighted")
    with SparkTestSession {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(25)

  private val MaxRaters = 5

  private val Scale = List("b0", "b1", "b2", "b3")

  /** BigInt replay of [[LabelQa.alphaWeightedCard]]'s integer
    * spelling — DoN/DeN/T/Wmax and the three floor-ppm rules — from
    * first principles (per-item position multisets), independent of
    * the dataflow plan. */
  private def referenceWeighted(items: Seq[Seq[Int]], k: Int,
      metric: String, maxRaters: Int)
      : (Long, Long, Long, BigInt, BigInt, BigInt) = {
    val l = (1 until maxRaters).map(BigInt(_))
      .reduce((a, b) => a * b / a.gcd(b))
    val per = items.map(_.groupBy(identity).view
      .mapValues(_.size.toLong).toMap)
    val pairable = per.filter(_.values.sum >= 2L)
    val t = BigInt(pairable.map(_.values.sum).sum)
    val marg: Map[Int, BigInt] = (0 until k)
      .map(c => c -> BigInt(pairable.flatMap(_.get(c)).sum)).toMap
    def w(c1: Int, c2: Int): BigInt = metric match {
      case "ordinal" =>
        val seg = (math.min(c1, c2) to math.max(c1, c2))
          .map(marg).sum
        val x = 2 * seg - marg(c1) - marg(c2)
        x * x
      case _ => BigInt(c1 - c2) * BigInt(c1 - c2)
    }
    val don = pairable.map { m =>
      val ki = m.values.sum
      val s = (for ((c1, n1) <- m; (c2, n2) <- m if c1 != c2)
        yield BigInt(n1) * BigInt(n2) * w(c1, c2)).sum
      s * (l / BigInt(ki - 1))
    }.foldLeft(BigInt(0))(_ + _)
    val den = (for (c1 <- 0 until k; c2 <- 0 until k if c1 != c2)
      yield marg(c1) * marg(c2) * w(c1, c2)).foldLeft(BigInt(0))(_ + _)
    val wmax = w(0, k - 1)
    def fdiv(num: BigInt, d: BigInt): BigInt = num * 1000000 / d.max(1)
    val alphaNum = l * den - don * (t - 1)
    val alphaP =
      if (alphaNum >= 0) fdiv(alphaNum, l * den)
      else -fdiv(-alphaNum, l * den)
    (items.size.toLong, pairable.size.toLong,
      marg.count(_._2 > 0).toLong,
      fdiv(don, l * t * wmax), fdiv(den, t * (t - 1) * wmax), alphaP)
  }

  private val weightedGen: Gen[(String, List[List[Int]])] = for {
    metric <- Gen.oneOf("ordinal", "interval")
    n <- Gen.choose(1, 14)
    items <- Gen.listOfN(n, for {
      k <- Gen.choose(1, MaxRaters)
      ls <- Gen.listOfN(k, Gen.choose(0, Scale.size - 1))
    } yield ls)
  } yield (metric, items)

  property("weighted card == BigInt reference on arbitrary designs " +
      "(both metrics, data-derived ordinal weights)") =
    forAll(weightedGen) { case (metric, items) =>
      import spark.implicits._
      val rows = items.zipWithIndex.flatMap { case (ls, i) =>
        ls.zipWithIndex.map { case (c, r) => (i.toLong, s"r$r", Scale(c)) }
      }
      if (rows.isEmpty) true
      else {
        val want = referenceWeighted(items, Scale.size, metric, MaxRaters)
        val row = LabelQa.alphaWeightedCard(
          rows.toDF("item", "rater", "lab"), "item", "rater", "lab",
          MaxRaters, Scale, metric).collect().head
        val got = (row.getAs[Long]("n_items"),
          row.getAs[Long]("n_pairable"), row.getAs[Long]("n_classes"),
          BigInt(row.getAs[Long]("do_ppm")),
          BigInt(row.getAs[Long]("de_ppm")),
          BigInt(row.getAs[Long]("alpha_ppm")))
        val same = got == want
        if (!same) println(
          s"WEIGHTED MISMATCH metric=$metric items=$items " +
            s"got=$got want=$want")
        same
      }
    }

  private val binaryGen: Gen[(String, List[List[Int]])] = for {
    metric <- Gen.oneOf("ordinal", "interval")
    n <- Gen.choose(1, 14)
    items <- Gen.listOfN(n, for {
      k <- Gen.choose(1, MaxRaters)
      ls <- Gen.listOfN(k, Gen.choose(0, 1))
    } yield ls)
  } yield (metric, items)

  property("on a binary scale both weighted metrics reduce EXACTLY " +
      "to the nominal card (the one off-diagonal weight cancels)") =
    forAll(binaryGen) { case (metric, items) =>
      import spark.implicits._
      val scale = List("lo", "hi")
      val rows = items.zipWithIndex.flatMap { case (ls, i) =>
        ls.zipWithIndex.map { case (c, r) => (i.toLong, s"r$r", scale(c)) }
      }
      if (rows.isEmpty) true
      else {
        val df = rows.toDF("item", "rater", "lab")
        val nom = LabelQa.alphaCard(df, "item", "rater", "lab",
          MaxRaters).collect().head
        val wtd = LabelQa.alphaWeightedCard(df, "item", "rater", "lab",
          MaxRaters, scale, metric).collect().head
        val same = Seq("n_items", "n_pairable", "n_classes", "do_ppm",
          "de_ppm", "alpha_ppm").forall(c =>
            nom.getAs[Long](c) == wtd.getAs[Long](c))
        if (!same) println(
          s"REDUCTION MISMATCH metric=$metric items=$items " +
            s"nom=$nom wtd=$wtd")
        same
      }
    }

}
