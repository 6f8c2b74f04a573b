package graft.llm

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[LabelQa.alphaCard]] edge semantics: the pinned-raters guard
  * fails loudly, a MISSING rating is not an abstain LABEL, and
  * unpairable items count without contributing. */
class AlphaSpec extends AnyFunSuite with SparkTestSession {

  private def df(rows: (Long, String, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("item", "rater", "lab")
  }

  // note: an item with ZERO ratings has no row in long format — it
  // does not exist to the card; AlphaProps generates k >= 1
  test("an item with more ratings than the pinned maxRaters kills " +
      "the card loudly") {
    val e = intercept[Exception] {
      LabelQa.alphaCard(df(
        (1L, "a", "en"), (1L, "b", "en"), (1L, "c", "en")),
        "item", "rater", "lab", maxRaters = 2).collect()
    }
    assert(e.getMessage != null)
  }

  test("a missing rating changes alpha differently than an abstain " +
      "label — the distinction the estimator exists for") {
    // two raters agree on two items; the third rater...
    val base = Seq((1L, "a", "en"), (1L, "b", "en"),
      (2L, "a", "no"), (2L, "b", "no"))
    // ...is MISSING entirely
    val missing = LabelQa.alphaCard(df(base: _*),
      "item", "rater", "lab", 3).collect().head
    // ...or ABSTAINS with a committed null-like label
    val abstain = LabelQa.alphaCard(
      df(base ++ Seq((1L, "c", "(abstain)"), (2L, "c", "(abstain)")): _*),
      "item", "rater", "lab", 3).collect().head
    assert(missing.getAs[Long]("alpha_ppm") === 1000000L,
      "perfect agreement among the ratings that exist")
    assert(abstain.getAs[Long]("alpha_ppm") < 1000000L,
      "an abstain LABEL disagrees with committed votes")
    assert(abstain.getAs[Long]("n_classes") === 3L)
  }

  test("unpairable items are counted but contribute nothing") {
    val withSingleton = LabelQa.alphaCard(df(
      (1L, "a", "en"), (1L, "b", "en"),
      (2L, "a", "no"), (2L, "b", "no"),
      (3L, "a", "de")), // k=1: unpairable
      "item", "rater", "lab", 3).collect().head
    assert(withSingleton.getAs[Long]("n_items") === 3L)
    assert(withSingleton.getAs[Long]("n_pairable") === 2L)
    // 'de' appears only on the unpairable item — not a class in the
    // coincidence universe
    assert(withSingleton.getAs[Long]("n_classes") === 2L)
    assert(withSingleton.getAs[Long]("alpha_ppm") === 1000000L)
  }
}
