package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[LabelQa.accuracyCard]] (q317): per-rater row ≡ [[LabelQa
  * .kappaCard]] over that rater's (label, truth) pairs, the
  * truth-parrot rater reads exactly 1.0 on both columns, a planted
  * majority-class parrot is exposed by kappa where accuracy flatters
  * it, and truthless items do not grade. */
class AccuracySpec extends AnyFunSuite with SparkTestSession {

  private def ratings(rows: (Long, String, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("item", "rater", "lab")
  }

  // truth: 8 items, 6 'en' + 2 'no' (skewed marginals on purpose)
  private val truth = {
    import spark.implicits._
    (1L to 8L).map(i => (i, if (i <= 6) "en" else "no"))
      .toDF("item", "lang")
  }

  // good: right on 7 of 8; parrot: always 'en' (right on 6 of 8 by
  // skew alone); oracle: copies truth exactly
  private val fixture = ratings(
    (1L to 8L).flatMap { i =>
      val t = if (i <= 6) "en" else "no"
      Seq((i, "good", if (i == 3L) "de" else t),
        (i, "parrot", "en"),
        (i, "oracle", t))
    }: _*)

  private def card = LabelQa.accuracyCard(fixture, "item", "rater",
    "lab", truth, "lang").collect()
    .map(r => r.getAs[String]("rater") -> r).toMap

  test("the truth-parrot row pins accuracy = kappa = 1.0; the " +
      "majority-parrot is exposed by kappa, not accuracy") {
    val c = card
    assert(c("oracle").getAs[Long]("accuracy_ppm") === 1000000L)
    assert(c("oracle").getAs[Long]("kappa_vs_truth_ppm") === 1000000L)
    // parrot: 6/8 = 75% accuracy looks respectable...
    assert(c("parrot").getAs[Long]("accuracy_ppm") === 750000L)
    // ...but kappa reads ZERO: all its agreement is marginal chance
    assert(c("parrot").getAs[Long]("kappa_vs_truth_ppm") === 0L)
    // the good rater beats the parrot on kappa by a wide margin
    assert(c("good").getAs[Long]("kappa_vs_truth_ppm") >
      c("parrot").getAs[Long]("kappa_vs_truth_ppm") + 500000L)
  }

  test("each rater's row equals kappaCard over its (label, truth) " +
      "pairs with n_correct = n_agree") {
    val c = card
    for (r <- Seq("good", "parrot", "oracle")) {
      val pairs = fixture.filter(col("rater") === r)
        .join(truth, Seq("item"))
      val k = LabelQa.kappaCard(pairs, "lab", "lang").collect().head
      assert(c(r).getAs[Long]("n_items") === k.getAs[Long]("n_items"))
      assert(c(r).getAs[Long]("n_correct") === k.getAs[Long]("n_agree"))
      assert(c(r).getAs[Long]("accuracy_ppm") === k.getAs[Long]("po_ppm"))
      assert(c(r).getAs[Long]("pe_sum") === k.getAs[Long]("pe_sum"))
      assert(c(r).getAs[Long]("pe_ppm") === k.getAs[Long]("pe_ppm"))
      assert(c(r).getAs[Long]("kappa_vs_truth_ppm") ===
        k.getAs[Long]("kappa_ppm"))
    }
  }

  test("accuracyCard with a rater's labels as truth equals that " +
      "kappaMatrix pair row — the q309 <-> q317 composition") {
    // two raters with partial, skewed, sometimes-agreeing labels
    val two = ratings(
      (1L, "a", "en"), (1L, "b", "en"),
      (2L, "a", "no"), (2L, "b", "en"),
      (3L, "a", "de"), (3L, "b", "de"),
      (4L, "a", "en"), (4L, "b", "no"),
      (5L, "a", "en"), (5L, "b", "en"))
    val m = LabelQa.kappaMatrix(two, "item", "rater", "lab")
      .collect().head // one unordered pair (a, b)
    val truthB = two.filter(col("rater") === "b")
      .select(col("item"), col("lab").as("t"))
    val acc = LabelQa.accuracyCard(two.filter(col("rater") === "a"),
      "item", "rater", "lab", truthB, "t").collect().head
    assert(acc.getAs[Long]("n_items") === m.getAs[Long]("n_items"))
    assert(acc.getAs[Long]("n_correct") === m.getAs[Long]("n_agree"))
    assert(acc.getAs[Long]("pe_sum") === m.getAs[Long]("pe_sum"))
    assert(acc.getAs[Long]("kappa_vs_truth_ppm") ===
      m.getAs[Long]("kappa_ppm"))
  }

  test("items without a truth row do not grade") {
    val extra = fixture.unionByName(ratings((99L, "good", "en")))
    val c = LabelQa.accuracyCard(extra, "item", "rater", "lab",
      truth, "lang").collect()
      .map(r => r.getAs[String]("rater") -> r).toMap
    assert(c("good").getAs[Long]("n_items") === 8L)
  }
}
