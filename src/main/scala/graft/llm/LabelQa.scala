package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Label-quality instruments for weak supervision: when two cheap
  * automatic labelers (a heuristic, a distilled classifier, a second
  * crawl's tags) vote on the same corpus, RAW agreement overstates
  * consensus whenever the label marginals are skewed — two labelers
  * that both say "en" 80% of the time agree 68% by luck alone. The
  * chance-corrected number an auto-accept rule ("admit when both
  * agree") must clear is Cohen's kappa (Cohen 1960):
  * `kappa = (po − pe) / (1 − pe)` with `pe` the marginal-product
  * chance-agreement rate.
  *
  * Reference scope: the reference pipeline (kartverket/
  * dask-felleskomponenter) carries per-column quality checks but no
  * labeler-agreement instrument; this is part of the training-data
  * extension surface, same discipline as [[TextAnalysis]].
  */
object LabelQa {

  /** One-row Cohen's-kappa card over a `(… aCol, bCol …)` frame of
    * paired label assignments (one row per item).
    *
    * Exact integer spelling: ONE (a, b) cell aggregate over the
    * corpus — everything downstream (marginals, the chance product,
    * the kappa ratio) is class-count-sized. With counts
    * `n`, `agree`, `na_c`, `nb_c`:
    *
    *   po_ppm    = ⌊10⁶·agree / n⌋
    *   pe_sum    = Σ_c na_c·nb_c          (exact, decimal(38,0))
    *   pe_ppm    = ⌊10⁶·pe_sum / n²⌋
    *   kappa_ppm = ±⌊10⁶·|agree·n − pe_sum| / (n² − pe_sum)⌋
    *
    * kappa is SIGNED (systematic disagreement reads negative), and
    * floor-of-|·| with the sign reapplied is spelled identically on
    * both engines — Spark's decimal `div` truncates toward zero while
    * DuckDB's `//` floors, so a bare quotient of a negative numerator
    * would differ by one ulp between engines. The degenerate
    * single-class-both-sides corpus (n² = pe_sum) reads kappa 0 via
    * the greatest(…, 1) guard, not an engine-dependent null.
    *
    * Output: `(n_items, n_agree, po_ppm, pe_sum, pe_ppm, kappa_ppm,
    * n_classes_a, n_classes_b)`. Null labels are real categories
    * (grouped as their own class) — a labeler that abstains disagrees
    * with one that commits. */
  def kappaCard(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val qa = graft.Names.quoted(aCol)
    val qb = graft.Names.quoted(bCol)
    val cells = Caches.persistTracked(
      pairs.groupBy(col(qa).as("__la"), col(qb).as("__lb"))
        .agg(count(lit(1)).as("__n")))
    val na = cells.groupBy(col("__la").as("__lab_a"))
      .agg(sum(col("__n")).as("__na"))
    val nb = cells.groupBy(col("__lb").as("__lab_b"))
      .agg(sum(col("__n")).as("__nb"))
    // null-safe marginal join: a null label is a real category (an
    // abstaining labeler), and a plain equi-join would drop its
    // marginal product from the chance term on both engines
    val marg = na.join(nb, col("__lab_a") <=> col("__lab_b"), "full_outer")
      .agg(
        coalesce(sum(coalesce(col("__na"), lit(0L)).cast("decimal(38,0)") *
          coalesce(col("__nb"), lit(0L)).cast("decimal(38,0)")),
          lit(0L).cast("decimal(38,0)")).as("__pe_sum"),
        count(col("__na")).as("n_classes_a"),
        count(col("__nb")).as("n_classes_b"))
    val tot = cells.agg(
      sum(col("__n")).as("n_items"),
      coalesce(sum(when(col("__la") <=> col("__lb"), col("__n"))
        .otherwise(0L)), lit(0L)).as("n_agree"))
    tot.crossJoin(marg).select(
      col("n_items"), col("n_agree"),
      expr("cast(cast(n_agree as decimal(38,0)) * 1000000 " +
        "div greatest(n_items, 1L) as bigint)").as("po_ppm"),
      col("__pe_sum").cast("bigint").as("pe_sum"),
      expr("cast(__pe_sum * 1000000 div greatest(" +
        "cast(n_items as decimal(38,0)) * n_items, 1L) as bigint)")
        .as("pe_ppm"),
      expr("""cast(case
        | when cast(n_agree as decimal(38,0)) * n_items - __pe_sum >= 0
        | then (cast(n_agree as decimal(38,0)) * n_items - __pe_sum) * 1000000
        |   div greatest(cast(n_items as decimal(38,0)) * n_items - __pe_sum, 1L)
        | else -((__pe_sum - cast(n_agree as decimal(38,0)) * n_items) * 1000000
        |   div greatest(cast(n_items as decimal(38,0)) * n_items - __pe_sum, 1L))
        | end as bigint)""".stripMargin).as("kappa_ppm"),
      col("n_classes_a").cast("bigint").as("n_classes_a"),
      col("n_classes_b").cast("bigint").as("n_classes_b"))
  }

  /** Lumped-label sentinel for [[kappaPivot]] — labels outside the
    * pinned class list (including null/abstain) fold into one
    * category, the [[Drift.chiSquarePivot]] OTHER-bucket discipline. */
  val OtherLabel = "(other)"

  /** [[kappaCard]] in the ingest spelling: the class list is the
    * monitor's PINNED config, so the whole card is ONE global
    * aggregate (per class, conditional-sum marginals + the agree
    * count) followed by row-local kappa arithmetic on the single
    * aggregated row — streaming-legal as-is (a live feed cannot run
    * [[kappaCard]]'s aggregate-of-aggregate marginal join), which is
    * why [[graft.streaming.Streams.kappaIngest]] IS this function.
    * Labels outside `classes` (and nulls — an abstaining labeler)
    * lump into [[OtherLabel]]; over a corpus whose labels the list
    * covers, the result row equals [[kappaCard]]'s exactly, and under
    * lumping it equals [[kappaCard]] over the pre-lumped labels
    * (both pinned in LabelQaSpec). State at scale: 2·(K+1)+2 longs
    * total, whatever the stream length. */
  def kappaPivot(pairs: DataFrame, aCol: String, bCol: String,
      classes: Seq[String]): DataFrame = {
    require(classes.nonEmpty, "need at least one pinned class")
    require(classes.distinct == classes, "pinned classes must be distinct")
    require(!classes.contains(OtherLabel),
      s"'$OtherLabel' is reserved for the lump bucket")
    val qa = col(graft.Names.quoted(aCol))
    val qb = col(graft.Names.quoted(bCol))
    val la = when(qa.isin(classes.map(x => x: Any): _*), qa)
      .otherwise(lit(OtherLabel))
    val lb = when(qb.isin(classes.map(x => x: Any): _*), qb)
      .otherwise(lit(OtherLabel))
    val cs = classes :+ OtherLabel
    val marginalAggs = cs.zipWithIndex.flatMap { case (c, i) =>
      Seq(sum(when(la === lit(c), 1L).otherwise(0L)).as(s"__na_$i"),
        sum(when(lb === lit(c), 1L).otherwise(0L)).as(s"__nb_$i"))
    }
    val aggs =
      Seq(coalesce(count(lit(1)), lit(0L)).as("n_items"),
        coalesce(sum(when(la === lb, 1L).otherwise(0L)), lit(0L))
          .as("n_agree")) ++ marginalAggs
    val one = pairs.agg(aggs.head, aggs.tail: _*)
    val peSum = cs.indices
      .map(i => col(s"__na_$i").cast("decimal(38,0)") * col(s"__nb_$i"))
      .reduce(_ + _)
    val nClasses = (pfx: String) => cs.indices
      .map(i => when(col(s"__${pfx}_$i") > 0L, 1L).otherwise(0L))
      .reduce(_ + _)
    one.withColumn("__pe_sum", peSum).select(
      col("n_items"), col("n_agree"),
      expr("cast(cast(n_agree as decimal(38,0)) * 1000000 " +
        "div greatest(n_items, 1L) as bigint)").as("po_ppm"),
      col("__pe_sum").cast("bigint").as("pe_sum"),
      expr("cast(__pe_sum * 1000000 div greatest(" +
        "cast(n_items as decimal(38,0)) * n_items, 1L) as bigint)")
        .as("pe_ppm"),
      expr("""cast(case
        | when cast(n_agree as decimal(38,0)) * n_items - __pe_sum >= 0
        | then (cast(n_agree as decimal(38,0)) * n_items - __pe_sum) * 1000000
        |   div greatest(cast(n_items as decimal(38,0)) * n_items - __pe_sum, 1L)
        | else -((__pe_sum - cast(n_agree as decimal(38,0)) * n_items) * 1000000
        |   div greatest(cast(n_items as decimal(38,0)) * n_items - __pe_sum, 1L))
        | end as bigint)""".stripMargin).as("kappa_ppm"),
      nClasses("na").cast("bigint").as("n_classes_a"),
      nClasses("nb").cast("bigint").as("n_classes_b"))
  }
}
