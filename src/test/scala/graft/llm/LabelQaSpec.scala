package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.lit
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

  // ---- fleissCard (q308) ----

  private def ratings(rows: (Long, String, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("item", "rater", "lab")
  }

  /** Independent Fleiss model: exact floor-ppm from raw long rows. */
  private def fleissModel(rows: Seq[(Long, String, String)])
      : (Long, Long, Long, Long, Long, Long, Long) = {
    val nic = rows.groupBy(r => (r._1, r._3)).view.mapValues(_.size).toMap
    val perItem = nic.groupBy(_._1._1).view
      .mapValues(m => (m.values.sum.toLong,
        m.values.map(v => BigInt(v) * v).sum)).toMap
    val kmax = if (perItem.isEmpty) 0L else perItem.values.map(_._1).max
    val t = BigInt(perItem.values.map(_._1).sum)
    val a = perItem.values.map(_._2).sum
    val p = perItem.values.map(v => BigInt(v._1) * (v._1 - 1)).sum
    val m2 = nic.groupBy(_._1._2).view
      .mapValues(m => BigInt(m.values.sum)).values.map(m => m * m).sum
    val nClasses = nic.keySet.map(_._2).size.toLong
    val po = ((a - t) * 1000000 / p.max(BigInt(1))).toLong
    val pe = (m2 * 1000000 / (t * t).max(BigInt(1))).toLong
    val num = (a - t) * t * t - m2 * p
    val den = (p * (t * t - m2)).max(BigInt(1))
    val k = (if (num >= 0) num * 1000000 / den
      else -((-num) * 1000000 / den)).toLong
    (perItem.size.toLong, kmax, nClasses,
      perItem.values.count(_._1 != kmax).toLong, po, pe, k)
  }

  private def fleiss(df: DataFrame) = {
    val r = LabelQa.fleissCard(df, "item", "rater", "lab").collect()
    assert(r.length === 1)
    r.head
  }

  test("fleiss: perfect k-rater agreement reads kappa = 10^6") {
    val r = fleiss(ratings(
      (1L, "a", "en"), (1L, "b", "en"), (1L, "c", "en"),
      (2L, "a", "no"), (2L, "b", "no"), (2L, "c", "no")))
    assert(r.getAs[Long]("n_items") === 2L)
    assert(r.getAs[Long]("n_raters") === 3L)
    assert(r.getAs[Long]("unbalanced_items") === 0L)
    assert(r.getAs[Long]("po_ppm") === 1000000L)
    assert(r.getAs[Long]("kappa_ppm") === 1000000L)
  }

  test("fleiss: random long fixtures match the BigInt model exactly, " +
      "including unbalanced designs") {
    val labs = Vector("en", "no", "de")
    var seed = 0x5DEECE66DL
    def nxt(m: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      ((seed >>> 33) % m).toInt
    }
    for (trial <- 1 to 6) {
      // 12 items, 2-4 raters each (rater identity irrelevant to Fleiss)
      val rows = for {
        item <- 1L to 12L
        r <- 0 until (2 + nxt(3))
      } yield (item, s"r$r", labs(nxt(labs.length)))
      val got = fleiss(ratings(rows: _*))
      val (ni, kr, nc, unb, po, pe, k) = fleissModel(rows)
      assert(got.getAs[Long]("n_items") === ni, s"n trial $trial")
      assert(got.getAs[Long]("n_raters") === kr, s"k trial $trial")
      assert(got.getAs[Long]("n_classes") === nc, s"c trial $trial")
      assert(got.getAs[Long]("unbalanced_items") === unb, s"u trial $trial")
      assert(got.getAs[Long]("po_ppm") === po, s"po trial $trial")
      assert(got.getAs[Long]("pe_ppm") === pe, s"pe trial $trial")
      assert(got.getAs[Long]("kappa_ppm") === k, s"kappa trial $trial")
    }
  }

  test("fleiss: empty ratings read zeros, not nulls") {
    import spark.implicits._
    val r = fleiss(Seq.empty[(Long, String, String)]
      .toDF("item", "rater", "lab"))
    assert(r.getAs[Long]("n_items") === 0L)
    assert(r.getAs[Long]("n_raters") === 0L)
    assert(r.getAs[Long]("po_ppm") === 0L)
    assert(r.getAs[Long]("pe_ppm") === 0L)
    assert(r.getAs[Long]("kappa_ppm") === 0L)
  }

  test("fleiss at k = 2 is Scott's pi, NOT Cohen's kappa — they differ " +
      "when the two raters' marginals differ") {
    // rater a says en 3/4, rater b says en 1/4: pooled marginals
    // (Fleiss/Scott) differ from the product of per-rater marginals
    // (Cohen), so the two statistics must diverge on this fixture
    val rows = Seq(
      (1L, ("en", "en")), (2L, ("en", "no")), (3L, ("en", "no")),
      (4L, ("no", "en")))
    val long = rows.flatMap { case (i, (la, lb)) =>
      Seq((i, "a", la), (i, "b", lb)) }
    val f = fleiss(ratings(long: _*)).getAs[Long]("kappa_ppm")
    val c = card(pairs(rows.map(_._2): _*)).getAs[Long]("kappa_ppm")
    assert(f !== c, "Scott's pi must differ from Cohen's kappa here")
  }

  // ---- fleissPivot (q313's monitor spelling) ----

  private def itemArrays(rows: (Long, Seq[String])*): DataFrame = {
    import spark.implicits._
    rows.toDF("item", "labs")
  }

  private def cardCols(r: org.apache.spark.sql.Row) =
    Seq("n_items", "n_raters", "n_classes", "unbalanced_items",
      "po_ppm", "pe_ppm", "kappa_ppm").map(c => c -> r.getAs[Long](c))

  test("fleissPivot == fleissCard on a covering class list and a " +
      "balanced design") {
    val long = Seq(
      (1L, "a", "en"), (1L, "b", "en"), (1L, "c", "no"),
      (2L, "a", "no"), (2L, "b", "no"), (2L, "c", "no"),
      (3L, "a", "de"), (3L, "b", "en"), (3L, "c", "de"),
      (4L, "a", "en"), (4L, "b", "en"), (4L, "c", "en"))
    val arrays = long.groupBy(_._1).toSeq
      .map { case (i, rs) => (i, rs.map(_._3)) }
    val got = LabelQa.fleissPivot(itemArrays(arrays: _*), "labs",
      Seq("en", "no", "de"), 3).collect().head
    val want = fleiss(ratings(long: _*))
    assert(cardCols(got) === cardCols(want))
  }

  test("fleissPivot under lumping == fleissCard over pre-lumped labels") {
    val long = Seq(
      (1L, "a", "en"), (1L, "b", "xx"), (1L, "c", "en"),
      (2L, "a", "yy"), (2L, "b", "xx"), (2L, "c", "en"),
      (3L, "a", "no"), (3L, "b", "no"), (3L, "c", "zz"))
    val arrays = long.groupBy(_._1).toSeq
      .map { case (i, rs) => (i, rs.map(_._3)) }
    val got = LabelQa.fleissPivot(itemArrays(arrays: _*), "labs",
      Seq("en", "no"), 3).collect().head
    val pre = long.map { case (i, r, l) =>
      (i, r, if (Seq("en", "no").contains(l)) l else LabelQa.OtherLabel) }
    val want = fleiss(ratings(pre: _*))
    assert(cardCols(got) === cardCols(want))
  }

  test("fleissPivot: unbalanced_items counts against the PINNED rater " +
      "count, and a null array is a zero-rating item") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("en", "en", "en")), (2L, Seq("en", "no")),
      (3L, Seq("no", "no", "no", "no"))).toDF("item", "labs")
      .unionByName(Seq(Tuple1(4L)).toDF("item")
        .withColumn("labs", lit(null).cast("array<string>")))
    val r = LabelQa.fleissPivot(df, "labs", Seq("en", "no"), 3)
      .collect().head
    assert(r.getAs[Long]("n_items") === 4L)
    assert(r.getAs[Long]("n_raters") === 3L, "config, not observed max")
    assert(r.getAs[Long]("unbalanced_items") === 3L,
      "items 2 (k=2), 3 (k=4) and 4 (k=0) differ from the pinned 3")
  }

  test("fleissPivot: empty input reads zeros; config is validated") {
    import spark.implicits._
    val r = LabelQa.fleissPivot(
      Seq.empty[(Long, Seq[String])].toDF("item", "labs"), "labs",
      Seq("en"), 2).collect().head
    assert(r.getAs[Long]("n_items") === 0L)
    assert(r.getAs[Long]("po_ppm") === 0L)
    assert(r.getAs[Long]("pe_ppm") === 0L)
    assert(r.getAs[Long]("kappa_ppm") === 0L)
    assert(r.getAs[Long]("n_classes") === 0L)
    val one = itemArrays((1L, Seq("en", "en")))
    intercept[IllegalArgumentException] {
      LabelQa.fleissPivot(one, "labs", Seq("en", LabelQa.OtherLabel), 2)
    }
    intercept[IllegalArgumentException] {
      LabelQa.fleissPivot(one, "labs", Seq("en"), 1)
    }
  }

  // ---- kappaMatrix (q309) ----

  test("matrix at two raters IS kappaCard's row") {
    val rows = Seq(("en", "en"), ("en", "no"), ("no", "no"), ("de", "en"),
      ("no", "no"), ("en", "en"), ("de", "de"))
    val long = rows.zipWithIndex.flatMap { case ((la, lb), i) =>
      Seq((i.toLong, "a", la), (i.toLong, "b", lb)) }
    val m = LabelQa.kappaMatrix(ratings(long: _*), "item", "rater", "lab")
      .collect()
    assert(m.length === 1)
    val got = m.head
    assert(got.getAs[String]("rater_a") === "a")
    assert(got.getAs[String]("rater_b") === "b")
    val want = card(pairs(rows: _*))
    for (c <- Seq("n_items", "n_agree", "po_ppm", "pe_sum", "pe_ppm",
        "kappa_ppm"))
      assert(got.getAs[Long](c) === want.getAs[Long](c), s"column $c")
  }

  test("matrix names the drifted labeler: both pairs touching it sag") {
    // raters a and b agree (high kappa); rater c answers a constant
    // label — zero information, so (a,c) and (b,c) read kappa <= 0
    val labs = Vector("en", "no", "de")
    val long = (1L to 30L).flatMap { i =>
      val truth = labs((i % 3).toInt)
      Seq((i, "a", truth), (i, "b", truth), (i, "c", "en"))
    }
    val m = LabelQa.kappaMatrix(ratings(long: _*), "item", "rater", "lab")
      .collect().map(r => ((r.getAs[String]("rater_a"),
        r.getAs[String]("rater_b")), r.getAs[Long]("kappa_ppm"))).toMap
    assert(m.size === 3, "three unordered pairs at three raters")
    assert(m(("a", "b")) === 1000000L)
    assert(m(("a", "c")) <= 0L && m(("b", "c")) <= 0L,
      "the constant labeler's pairs must sag to chance or below")
  }

  test("matrix treats null labels as a real category, pair-symmetrically") {
    val long = Seq(
      (1L, "a", "en"), (1L, "b", null), (2L, "a", null), (2L, "b", null),
      (3L, "a", "no"), (3L, "b", "no"))
    val m = LabelQa.kappaMatrix(ratings(long.map(t =>
        (t._1, t._2, t._3)): _*), "item", "rater", "lab").collect()
    assert(m.length === 1)
    // item 2 agrees as (null, null); item 1 disagrees
    assert(m.head.getAs[Long]("n_items") === 3L)
    assert(m.head.getAs[Long]("n_agree") === 2L)
  }
}
