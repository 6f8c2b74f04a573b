package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trained token-vote text classifier (multinomial naive Bayes reduced
  * to a per-token argmax vote), in the exact integer arithmetic every
  * trained artifact here uses so train → ship → score replays
  * byte-for-byte in a second engine.
  *
  * WHY a vote, not a log-likelihood sum: the NB decision rule needs
  * `Σ_tokens log p(w|c)` — floating-point logs are not replayable
  * across engines (see q163's ppm contract), and exact rational sums
  * of products overflow any fixed width. Per-token argmax with
  * add-one smoothing keeps every comparison a single exact integer
  * floor-division `(cnt+1)·10⁹ div (total_c + |V|)` — decimal(38,0)
  * on the Spark side, HUGEINT in the oracle — and the document
  * decision a majority over those votes: deterministic, orderable,
  * and exactly the quality/language router a curation pipeline wants
  * (reference scope: the platform validates `tableclassification`
  * metadata, `governance/checks/table.py`; this supplies the
  * content-derived classification signal itself).
  *
  * Scale shape: training is ONE (label, token) aggregate — bounded by
  * classes × token types (Heaps' law), not corpus tokens. Scoring
  * precomputes the winner PER TOKEN TYPE over that vocab-sized frame
  * (window over `w`), so the corpus-sized eval side pays one tf
  * aggregate (map-side combinable), one vocab join on `w`, and one
  * doc-keyed aggregate — no per-class expansion of the corpus and no
  * corpus-sized window. The counts frame is the shippable artifact
  * ([[Artifacts.saveIndexFrame]]); totals, vocabulary size, and the
  * winner table all re-derive from it, so a loaded replica scores
  * byte-identically to the session that trained it. */
object NbClassifier {

  /** Fixed-point scale for the smoothed per-class token score. 10⁹
    * keeps three more decimal digits than the repo's ppm convention
    * (class totals at 100 TB make neighboring scores close); the
    * product runs in decimal(38,0)/HUGEINT so the scale never
    * overflows int64 mid-expression. */
  val ScaleFp = 1000000000L

  /** Label assigned to documents with no tokens at all — no evidence,
    * no vote; kept distinct from the smoothing-prior default a doc of
    * only-unseen tokens gets. */
  val NoEvidenceLabel = "(none)"

  /** Train: the `(label, w, cnt)` token-count table from a labeled
    * corpus slice — the classifier's entire trained state. Null
    * labels are excluded (no class to credit). */
  def train(docs: DataFrame, textCol: String, labelCol: String): DataFrame = {
    val qt = graft.Names.quoted(textCol)
    val ql = graft.Names.quoted(labelCol)
    docs.filter(col(ql).isNotNull)
      .select(col(ql).cast("string").as("label"),
        explode(TextAnalysis.tokens(col(qt))).as("w"))
      .groupBy(col("label"), col("w"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Delta-training: counts are a commutative monoid under per-cell
    * addition, so a shipped artifact extends with a new labeled batch
    * WITHOUT re-reading the old corpus — `merge(train(A), train(B))`
    * equals `train(A ∪ B)` exactly (pinned in NbClassifierSpec),
    * which makes incremental retrains byte-honest, not approximate.
    * One (label, w) aggregate over the concatenated count frames. */
  def mergeCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("label"), col("w"))
      .agg(sum(col("cnt")).cast("bigint").as("cnt"))

  /** Smoothed fixed-point class score — the one spelling both the
    * winner table and the unseen-token default run through. */
  private def scoreFp: Column =
    expr(s"cast((cast(cnt + 1 as decimal(38,0)) * $ScaleFp) " +
      "div (tot + v) as bigint)")

  /** Per-class token totals + smoothing denominator constants,
    * re-derived from the counts artifact: ≤ |classes| rows with the
    * train vocabulary size cross-joined on. */
  private def totalsWithV(counts: DataFrame): DataFrame =
    counts.groupBy(col("label"))
      .agg(sum(col("cnt")).cast("bigint").as("tot"))
      .crossJoin(counts.select(countDistinct(col("w")).as("v")))

  /** The winner table: for every token TYPE in the train vocabulary,
    * the class maximizing the smoothed score (ties → smallest label).
    * Vocab-sized — this is what makes corpus scoring one join. */
  def tokenVerdicts(counts: DataFrame): DataFrame = {
    val cells = counts.select(col("w")).distinct()
      .crossJoin(broadcast(totalsWithV(counts)))
      .join(counts, Seq("w", "label"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .withColumn("score_fp", scoreFp)
    cells.withColumn("__rn", row_number().over(
        Window.partitionBy(col("w"))
          .orderBy(col("score_fp").desc, col("label").asc)))
      .filter(col("__rn") === 1)
      .select(col("w"), col("label").as("label_pred"))
  }

  /** The class an UNSEEN token votes for: argmax of the pure
    * smoothing score `1·10⁹ div (tot_c + |V|)` — i.e. the class with
    * the smallest training mass, ties → smallest label. One row. */
  def defaultVerdict(counts: DataFrame): DataFrame =
    totalsWithV(counts)
      .withColumn("cnt", lit(0L))
      .withColumn("score_fp", scoreFp)
      // TakeOrdered over ≤ |classes| rows (the topVocab shape) — a
      // global window here would warn and single-partition the stage
      .orderBy(col("score_fp").desc, col("label").asc)
      .limit(1)
      .select(col("label").as("label_dflt"))

  /** The corpus-side term-frequency frame `(doc_id, w, tf)` predict
    * scores against — public so a card comparing several trained
    * variants on the SAME eval slice (q218) tokenizes that slice
    * once, persists this frame, and shares it across variants instead
    * of re-exploding the corpus per variant. */
  def termFrequencies(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val qid = graft.Names.quoted(idCol)
    val qt = graft.Names.quoted(textCol)
    docs.select(col(qid).as("doc_id"),
        explode(TextAnalysis.tokens(col(qt))).as("w"))
      .groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("tf"))
  }

  /** Score a corpus against a trained counts frame: every token
    * occurrence votes for its type's winner class (unseen types vote
    * the smoothing default), the document takes the majority (ties →
    * smallest label), token-free documents get [[NoEvidenceLabel]].
    * Output: `(doc_id, label_pred, n_tokens, share_ppm)` for every
    * input doc — `share_ppm` is the winning class's share of all
    * votes (floor ppm; 0 with no evidence), the confidence signal
    * the calibration card (q209) buckets. */
  def predict(docs: DataFrame, counts: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val qid = graft.Names.quoted(idCol)
    predictFromTf(docs.select(col(qid).as("doc_id")),
      termFrequencies(docs, idCol, textCol), counts)
  }

  /** [[predict]] over a PRECOMPUTED (doc_id, w, tf) frame — the
    * share-one-tokenize entry point for multi-variant cards. `docIds`
    * supplies the full eval universe (one `doc_id` column) so
    * token-free documents still land in the output. */
  def predictFromTf(docIds: DataFrame, tf: DataFrame,
      counts: DataFrame): DataFrame = {
    // The smoothing default must stay a ONE-row frame even when the
    // counts frame is empty: a bare crossJoin with an empty
    // defaultVerdict would collapse the votes frame to zero rows and
    // silently mark every doc no-evidence (ADVICE r13). A left join
    // from a literal single row instead carries a NULL default, so
    // with no trained counts every token votes NULL, each doc groups
    // into one NULL-label majority, and the output matches the
    // oracle's NULL-scalar-subquery spelling exactly: label_pred
    // coalesces to (none) but n_tokens stays real and share_ppm is
    // 1000000 — the trap the advisor flagged, closed in-plan with no
    // eager driver action.
    val dflt = docIds.sparkSession.range(1).toDF("__one")
      .join(broadcast(defaultVerdict(counts).withColumn("__one", lit(0L))),
        Seq("__one"), "left")
      .select(col("label_dflt"))
    val votes = tf.join(tokenVerdicts(counts), Seq("w"), "left")
      .crossJoin(broadcast(dflt))
      .withColumn("lab", coalesce(col("label_pred"), col("label_dflt")))
      .groupBy(col("doc_id"), col("lab"))
      .agg(sum(col("tf")).as("votes"))
    // both windows share the doc_id partition key → ONE shuffle, one
    // window stage; the doc total rides along instead of re-reading
    // `votes` through a second aggregate consumer
    val pred = votes
      .withColumn("__nt",
        sum(col("votes")).over(Window.partitionBy(col("doc_id"))))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("votes").desc, col("lab").asc)))
      .filter(col("__rn") === 1)
      .select(col("doc_id"), col("lab").as("__lab"),
        col("__nt").cast("bigint").as("__nt"),
        col("votes").cast("bigint").as("__tv"))
    docIds.select(col("doc_id"))
      .join(pred, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("__lab"), lit(NoEvidenceLabel)).as("label_pred"),
        coalesce(col("__nt"), lit(0L)).as("n_tokens"),
        coalesce(expr("cast(cast(__tv as decimal(38,0)) * 1000000 " +
          "div greatest(__nt, 1L) as bigint)"), lit(0L)).as("share_ppm"))
  }

  /** The evaluation card: confusion matrix of a labeled eval slice
    * against the trained counts — `(label_true, label_pred, n_docs)`.
    * Every doc in `docs` lands in exactly one cell. */
  def confusionCard(docs: DataFrame, counts: DataFrame,
      idCol: String, textCol: String, labelCol: String): DataFrame = {
    val qid = graft.Names.quoted(idCol)
    val ql = graft.Names.quoted(labelCol)
    predict(docs, counts, idCol, textCol)
      .join(docs.select(col(qid).as("doc_id"),
        col(ql).cast("string").as("label_true")), Seq("doc_id"))
      .groupBy(col("label_true"), col("label_pred"))
      .agg(count(lit(1)).as("n_docs"))
  }
}
