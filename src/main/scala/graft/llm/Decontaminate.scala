package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/eval decontamination: flag training documents that share
  * winnowed rolling-hash fingerprints ([[Fingerprint]]) with any
  * evaluation document — the standard check that benchmark text has
  * not leaked into a training corpus (shifted or lightly edited
  * copies still collide on most fingerprints, where whole-document
  * hashing misses them).
  *
  * Scale shape: fingerprints are row-local; the only join is an
  * equi-join of exploded 8-byte fingerprint values against the
  * (distinct, typically much smaller) eval fingerprint set — shuffle
  * keys are hashes, never text. Contamination is reported as
  * fixed-point millionths of the training doc's distinct fingerprints
  * found in the eval set (the MOSS containment measure, directional:
  * train ⊆ eval).
  */
object Decontaminate {

  private def fps(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
      expr(s"array_distinct(doc_fingerprints($textCol))").as("fps"))

  /** Shared tail: exploded train fingerprints ⋈ distinct eval
    * fingerprints → per-doc containment. */
  private def containmentOf(trainFps: DataFrame, evalFps: DataFrame): DataFrame =
    trainFps
      .join(evalFps, "fp")
      .groupBy(col("doc_id"))
      .agg(max(col("n_fps")).as("n_fps"), count(lit(1)).as("n_shared"))
      .select(col("doc_id"), col("n_fps"), col("n_shared"),
        expr("cast(floor(1000000.0 * cast(n_shared as double) / cast(n_fps as double)) as bigint)")
          .as("contamination_fp"))

  /** (doc_id, n_fps, n_shared, contamination_fp) for every training
    * doc with at least one fingerprint shared with `eval`. */
  def contaminated(train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    Fingerprint.register(train.sparkSession)
    val evalFps = fps(eval, idCol, textCol).select(explode(col("fps")).as("fp")).distinct()
    containmentOf(
      fps(train, idCol, textCol)
        .select(col("doc_id"), size(col("fps")).cast("bigint").as("n_fps"),
          explode(col("fps")).as("fp")),
      evalFps)
  }

  /** [[contaminated]] with a broadcast Bloom-filter prefilter — the
    * 100 TB formulation. The exact path shuffles EVERY training
    * fingerprint into the equi-join, but at corpus scale the join's
    * selectivity is tiny (benchmark leakage is rare), so almost all
    * of that shuffle is wasted motion. Here the (small) eval
    * fingerprint set is folded into a Bloom filter (distributed
    * aggregation, one compact bitset on the driver), broadcast, and
    * applied SCAN-SIDE: only fingerprints the filter might contain
    * reach the exchange. The exact join then re-checks the
    * survivors, so Bloom false positives change COST, never RESULTS
    * — output is bit-identical to [[contaminated]] (q68 shares q45's
    * oracle), while the shuffled volume drops by ~(1 − fpp) on clean
    * corpora.
    *
    * `fpp` trades filter size for prefilter precision: 1% at 1M eval
    * fingerprints is ~1.2 MB broadcast — irrelevant next to shuffling
    * a 100 TB corpus's fingerprint stream.
    *
    * EAGER at construction: building the Bloom filter runs two Spark
    * jobs (the eval-fingerprint count and the bloomFilter aggregate)
    * before the returned DataFrame is ever acted on — unavoidable,
    * since the filter must exist to plan the scan-side prune. The
    * broadcast and the cached eval projection are tracked in
    * [[Caches]]; `Caches.unpersistAll()` releases both (between
    * corpora, as Bench does per iteration). */
  /** The standalone prefilter build — the TRAIN side of the Bloom
    * artifact ([[graft.llm.Artifacts.saveBloom]]): the eval set's
    * distinct winnowed fingerprints folded into one Bloom filter.
    * `None` when the eval set yields no fingerprints (a filter over
    * zero rows cannot be built, and there is nothing to prefilter
    * against). Runs two Spark jobs (count + bloomFilter aggregate). */
  def evalBloom(eval: DataFrame, idCol: String, textCol: String,
      fpp: Double = 0.01): Option[org.apache.spark.util.sketch.BloomFilter] = {
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0, 1), got $fpp")
    Fingerprint.register(eval.sparkSession)
    val evalFps = fps(eval, idCol, textCol)
      .select(explode(col("fps")).as("fp")).distinct()
    val n = evalFps.count()
    if (n == 0) None else Some(evalFps.stat.bloomFilter("fp", n, fpp))
  }

  /** [[contaminatedBloom]] with a PRE-BUILT prefilter — the serve
    * side of the Bloom artifact: a benchmark eval set is fixed for
    * months, so its filter is trained once ([[evalBloom]]), shipped
    * ([[graft.llm.Artifacts.saveBloom]]/`loadBloom`), and every
    * ingest job broadcasts the loaded bitset instead of re-running
    * the build aggregate. False positives are erased by the
    * confirming equi-join, so any filter BUILT OVER THE SAME eval
    * fingerprints yields output bit-identical to [[contaminated]].
    * A STALE artifact (eval set changed since training) can drop
    * true fingerprints scan-side — a missed-contamination false
    * negative the join cannot resurrect; re-train the artifact
    * whenever the eval set changes. */
  def contaminatedBloom(train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String,
      bloom: org.apache.spark.util.sketch.BloomFilter): DataFrame = {
    Fingerprint.register(train.sparkSession)
    val evalFps = fps(eval, idCol, textCol)
      .select(explode(col("fps")).as("fp")).distinct()
    val trainFps = fps(train, idCol, textCol)
      .select(col("doc_id"), size(col("fps")).cast("bigint").as("n_fps"),
        explode(col("fps")).as("fp"))
    val bc = Caches.broadcastTracked(
      train.sparkSession.sparkContext.broadcast(bloom))
    val mightContain = udf((fp: Long) => bc.value.mightContainLong(fp))
    containmentOf(trainFps.filter(mightContain(col("fp"))), evalFps)
  }

  def contaminatedBloom(train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, fpp: Double = 0.01): DataFrame = {
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0, 1), got $fpp")
    Fingerprint.register(train.sparkSession)
    // the eval fingerprint set feeds two consumers (the Bloom build
    // and the confirming join) — cache the skinny distinct projection
    val evalFps = Caches.persistTracked(
      fps(eval, idCol, textCol).select(explode(col("fps")).as("fp")).distinct())
    val trainFps = fps(train, idCol, textCol)
      .select(col("doc_id"), size(col("fps")).cast("bigint").as("n_fps"),
        explode(col("fps")).as("fp"))
    val n = evalFps.count()
    // an empty eval set can contaminate nothing — and Spark's
    // bloomFilter aggregate cannot be built over zero rows
    if (n == 0) containmentOf(trainFps, evalFps)
    else {
      val bloom = evalFps.stat.bloomFilter("fp", n, fpp)
      val bc = Caches.broadcastTracked(
        train.sparkSession.sparkContext.broadcast(bloom))
      val mightContain = udf((fp: Long) => bc.value.mightContainLong(fp))
      containmentOf(trainFps.filter(mightContain(col("fp"))), evalFps)
    }
  }
}
