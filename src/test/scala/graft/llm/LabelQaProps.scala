package graft.llm

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.SparkTestSession

/** ScalaCheck: the r17 agreement surface's reduction contracts on
  * ARBITRARY fixtures — [[LabelQa.kappaMatrix]] at exactly two raters
  * IS [[LabelQa.kappaCard]], and [[LabelQa.fleissPivot]] on a
  * covering class list and balanced design IS [[LabelQa.fleissCard]].
  * Generators skew marginals and plant disagreement freely, so the
  * pins hold on the ugly integer-division edge cases (tiny n, all-
  * agree, all-disagree, one-class), not just the hand fixtures in
  * LabelQaSpec. */
object LabelQaProps extends Properties("LabelQa") with SparkTestSession {

  private val labels = Vector("en", "no", "de", "sv")

  private val pairsGen: Gen[List[(String, String)]] = for {
    n <- Gen.choose(1, 40)
    rows <- Gen.listOfN(n, for {
      a <- Gen.oneOf(labels)
      agree <- Gen.prob(0.5)
      b <- if (agree) Gen.const(a) else Gen.oneOf(labels)
    } yield (a, b))
  } yield rows

  property("kappaMatrix at two raters == kappaCard, column for column") =
    forAll(pairsGen) { rows =>
      import spark.implicits._
      val long = rows.zipWithIndex.flatMap { case ((la, lb), i) =>
        Seq((i.toLong, "a", la), (i.toLong, "b", lb)) }
      val m = LabelQa.kappaMatrix(long.toDF("item", "rater", "lab"),
        "item", "rater", "lab").collect()
      val c = LabelQa.kappaCard(rows.toDF("lab_a", "lab_b"),
        "lab_a", "lab_b").collect().head
      val cols = Seq("n_items", "n_agree", "po_ppm", "pe_sum",
        "pe_ppm", "kappa_ppm")
      val same = m.length == 1 &&
        cols.forall(k => m.head.getAs[Long](k) == c.getAs[Long](k))
      if (!same) println(s"MISMATCH rows=$rows\n matrix=${m.toSeq}\n card=$c")
      same
    }

  private val ratingsGen: Gen[(Int, List[(Long, List[String])])] = for {
    k <- Gen.choose(2, 5)
    n <- Gen.choose(1, 20)
    items <- Gen.listOfN(n, Gen.listOfN(k, Gen.oneOf(labels)))
  } yield (k, items.zipWithIndex.map { case (ls, i) => (i.toLong, ls) })

  property("fleissPivot on a covering list and balanced design == " +
      "fleissCard, column for column") =
    forAll(ratingsGen) { case (k, items) =>
      import spark.implicits._
      val pivot = LabelQa.fleissPivot(items.toDF("item", "labs"),
        "labs", labels, k).collect().head
      val long = items.flatMap { case (i, ls) =>
        ls.zipWithIndex.map { case (l, r) => (i, s"r$r", l) } }
      val card = LabelQa.fleissCard(long.toDF("item", "rater", "lab"),
        "item", "rater", "lab").collect().head
      val cols = Seq("n_items", "n_raters", "n_classes",
        "unbalanced_items", "po_ppm", "pe_ppm", "kappa_ppm")
      val same = cols.forall(c => pivot.getAs[Long](c) == card.getAs[Long](c))
      if (!same) println(s"MISMATCH k=$k items=$items\n pivot=$pivot\n card=$card")
      same
    }
}
