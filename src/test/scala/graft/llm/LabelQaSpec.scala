package graft.llm

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[LabelQa.kappaCard]]: the exact-integer kappa arithmetic against
  * an independent BigInt model, the canonical fixtures (perfect
  * agreement = 10⁶, planted independence = 0, systematic disagreement
  * < 0), the degenerate one-class corpus, and the null-label
  * contract. */
class LabelQaSpec extends AnyFunSuite with SparkTestSession {

  private def pairs(rows: (String, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("lab_a", "lab_b")
  }

  private def card(df: DataFrame) = {
    val r = LabelQa.kappaCard(df, "lab_a", "lab_b").collect()
    assert(r.length === 1)
    r.head
  }

  /** Independent model: exact kappa ppm from raw pairs via BigInt. */
  private def model(rows: Seq[(String, String)]): (Long, Long, Long) = {
    val n = BigInt(rows.length)
    val agree = BigInt(rows.count { case (a, b) => a == b })
    val na = rows.groupBy(_._1).view.mapValues(v => BigInt(v.length)).toMap
    val nb = rows.groupBy(_._2).view.mapValues(v => BigInt(v.length)).toMap
    val pe = (na.keySet ++ nb.keySet).toSeq
      .map(c => na.getOrElse(c, BigInt(0)) * nb.getOrElse(c, BigInt(0))).sum
    val num = agree * n - pe
    val den = (n * n - pe).max(BigInt(1))
    val kappa =
      if (num >= 0) num * 1000000 / den else -((-num) * 1000000 / den)
    ((agree * 1000000 / n.max(BigInt(1))).toLong,
      (pe * 1000000 / (n * n).max(BigInt(1))).toLong, kappa.toLong)
  }

  test("empty pair frame reads zeros, not nulls — card == pivot on the " +
      "degenerate corpus") {
    import spark.implicits._
    val empty = Seq.empty[(String, String)].toDF("lab_a", "lab_b")
    val r = card(empty)
    assert(r.getAs[Long]("n_items") === 0L)
    assert(r.getAs[Long]("n_agree") === 0L)
    assert(r.getAs[Long]("po_ppm") === 0L)
    assert(r.getAs[Long]("pe_ppm") === 0L)
    assert(r.getAs[Long]("kappa_ppm") === 0L)
    val p = LabelQa.kappaPivot(empty, "lab_a", "lab_b", Seq("en", "no"))
      .collect().head
    assert(p.getAs[Long]("n_items") === 0L &&
      p.getAs[Long]("kappa_ppm") === r.getAs[Long]("kappa_ppm"),
      "empty-corpus parity between spellings")
  }

  test("perfect agreement reads kappa = 10^6") {
    val r = card(pairs(("en", "en"), ("no", "no"), ("de", "de"),
      ("en", "en")))
    assert(r.getAs[Long]("n_items") === 4L)
    assert(r.getAs[Long]("n_agree") === 4L)
    assert(r.getAs[Long]("po_ppm") === 1000000L)
    assert(r.getAs[Long]("kappa_ppm") === 1000000L)
  }

  test("planted independence reads kappa = 0 at full precision") {
    // 2x2 product design: marginals A(en)=1/2, B(en)=1/2, cells laid
    // out so po == pe exactly (agree = 2 of 4, pe_sum = 8 of 16)
    val rows = Seq(("en", "en"), ("en", "no"), ("no", "en"), ("no", "no"))
    val r = card(pairs(rows: _*))
    val (po, pe, k) = model(rows)
    assert(r.getAs[Long]("po_ppm") === po)
    assert(r.getAs[Long]("pe_ppm") === pe)
    assert(r.getAs[Long]("kappa_ppm") === k)
    assert(k === 0L)
  }

  test("systematic disagreement reads NEGATIVE kappa, engines-symmetric floor") {
    // both labelers use {en, no} with uniform marginals but NEVER
    // agree: po = 0, pe = 1/2, kappa = -1
    val rows = Seq(("en", "no"), ("no", "en"), ("en", "no"), ("no", "en"))
    val r = card(pairs(rows: _*))
    val (_, _, k) = model(rows)
    assert(r.getAs[Long]("kappa_ppm") === k)
    assert(k === -1000000L)
  }

  test("skewed marginals: raw agreement high, kappa exposes the chance floor") {
    // 9 of 10 items are "en" for both labelers; the one "no" item is
    // missed by B. po = 9/10 but the en marginal makes pe huge.
    val rows = Seq.fill(9)(("en", "en")) :+ (("no", "en"))
    val r = card(pairs(rows: _*))
    val (po, pe, k) = model(rows)
    assert(r.getAs[Long]("po_ppm") === po)
    assert(po === 900000L)
    assert(r.getAs[Long]("pe_ppm") === pe)
    assert(r.getAs[Long]("kappa_ppm") === k)
    assert(k === 0L) // agree*n == pe_sum here: all agreement is chance
  }

  test("degenerate one-class corpus reads kappa 0, not null") {
    val r = card(pairs(("en", "en"), ("en", "en")))
    assert(r.getAs[Long]("po_ppm") === 1000000L)
    assert(r.getAs[Long]("pe_ppm") === 1000000L)
    assert(r.getAs[Long]("kappa_ppm") === 0L)
  }

  test("null labels are real categories (abstain disagrees with commit)") {
    val r = card(pairs(("en", null), ("en", null), (null, null)))
    assert(r.getAs[Long]("n_agree") === 1L) // null <=> null agrees
    assert(r.getAs[Long]("n_classes_a") === 2L)
    assert(r.getAs[Long]("n_classes_b") === 1L)
  }

  test("kappaPivot equals kappaCard when the pinned list covers the labels") {
    val rows = Seq(("en", "en"), ("en", "no"), ("no", "en"), ("no", "no"),
      ("de", "de"), ("en", "en"), ("de", "no"))
    val df = pairs(rows: _*)
    val a = LabelQa.kappaCard(df, "lab_a", "lab_b").collect().head
    val b = LabelQa.kappaPivot(df, "lab_a", "lab_b",
      Seq("en", "no", "de")).collect().head
    assert(a.toSeq === b.toSeq)
  }

  test("kappaPivot under lumping equals kappaCard over pre-lumped labels") {
    import org.apache.spark.sql.functions._
    val rows = Seq(("en", "en"), ("sv", "da"), ("da", "en"), ("en", "sv"),
      ("no", "no"), (null, "en"), ("en", null))
    val df = pairs(rows: _*)
    val pinned = Seq("en", "no")
    def lump(c: String) = when(col(c).isin(pinned: _*), col(c))
      .otherwise(lit(LabelQa.OtherLabel)).as(c)
    val a = LabelQa.kappaCard(
      df.select(lump("lab_a"), lump("lab_b")), "lab_a", "lab_b")
      .collect().head
    val b = LabelQa.kappaPivot(df, "lab_a", "lab_b", pinned).collect().head
    assert(a.toSeq === b.toSeq)
    // the lump is real: (sv, da) agrees as (other, other); the null
    // rows disagree as (other, en) / (en, other)
    assert(b.getAs[Long]("n_agree") === 3L)
  }

  test("kappaPivot rejects a pinned list containing the lump sentinel") {
    val df = pairs(("en", "en"))
    intercept[IllegalArgumentException] {
      LabelQa.kappaPivot(df, "lab_a", "lab_b", Seq("en", LabelQa.OtherLabel))
    }
  }

  test("random fixtures match the BigInt model exactly") {
    val labs = Vector("en", "no", "de", "sv", "(none)")
    var seed = 0x9E3779B97F4A7C15L
    def nxt(): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      ((seed >>> 33) % labs.length).toInt
    }
    for (trial <- 1 to 8) {
      val rows = Seq.fill(40 + trial * 7)((labs(nxt()), labs(nxt())))
      val r = card(pairs(rows: _*))
      val (po, pe, k) = model(rows)
      assert(r.getAs[Long]("po_ppm") === po, s"po trial $trial")
      assert(r.getAs[Long]("pe_ppm") === pe, s"pe trial $trial")
      assert(r.getAs[Long]("kappa_ppm") === k, s"kappa trial $trial")
    }
  }
}
