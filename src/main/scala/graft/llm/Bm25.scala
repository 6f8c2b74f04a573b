package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Fixed-point BM25 ranked retrieval over a text corpus — the scoring
  * half of the retrieval stack whose matching half is [[Postings]]
  * (phrase search finds WHERE content occurs; BM25 ranks WHICH
  * documents matter for a term set). The classic formulation is
  * float-transcendental (ln idf, fractional saturation); this one is
  * integer-exact end to end so the same query is reproducible across
  * engines and partitionings:
  *
  *   - idf in QUARTER-bits: `floor(4·log2(N/df)) = bitlen(N⁴ div df⁴) - 1`
  *     — the q71 digit-length trick sharpened 4× by exponentiating the
  *     ratio before taking the floor (BigInt, so no N cap). Rare terms
  *     weigh more, df=N terms weigh 0, and no engine's `log` is
  *     consulted.
  *   - tf saturation with k1=1.2, b=0.75 as one integer division:
  *     `sat_fp = (10⁶·22·tf·S) div (10·tf·S + 3·S + 9·norm_s)` where
  *     `norm_s = (dl·D·S) div TL ≈ S·dl/avgdl` and S=10⁴ — the exact
  *     rational `tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))` with every
  *     constant cleared of its denominator (×10·S), floored once.
  *   - score = Σ_terms idf_q4·sat_fp, a sum of longs — order-invariant,
  *     so partitioning cannot shift a rank.
  *
  * 100 TB shape: the term filter lands BEFORE the tf shuffle (only
  * query-term tokens leave the scan); corpus statistics reaching the
  * driver are two scalars + one ≤|terms|-row df table (the IVF-seed
  * bounded-collect shape); queries and idf weights ride broadcast;
  * per-query selection is the two-level [[Similarity.topKPerQuery]]
  * heap — no task ever sorts a query's full posting list. Long-safety
  * contract: `dl·D·S` must fit a long — at 10⁴-token docs that allows
  * ~9·10¹⁰ documents.
  */
object Bm25 {

  /** Doc-length norm scale S: norm_s ≈ S·dl/avgdl. */
  val NormScale = 10000L

  /** `floor(4·log2(n/df))` computed integer-exactly as the binary
    * digit length of `n⁴ div df⁴` minus one (BigInt — exact at any
    * corpus size). Monotone in n/df; 0 for df=n. */
  def idfQ4(nDocs: Long, df: Long): Long = {
    require(df > 0, "df must be positive")
    require(nDocs >= df, s"df ($df) cannot exceed corpus size ($nDocs)")
    (BigInt(nDocs).pow(4) / BigInt(df).pow(4)).bitLength - 1L
  }

  /** Top-`k` documents per query under fixed-point BM25, ranked
    * `score_fp` desc / `doc_id` asc. Queries are `(label, terms)`;
    * duplicate terms within a query count once. Returns
    * `(query_id, doc_id, score_fp, rn)` — only documents matching at
    * least one query term appear, so a query can return < k rows. */
  def scoreTopK(docs: DataFrame, idCol: String, textCol: String,
      queries: Seq[(String, Seq[String])], k: Int): DataFrame = {
    require(queries.nonEmpty, "at least one query")
    require(queries.forall(_._2.nonEmpty), "every query needs at least one term")
    require(k > 0, "k must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val q = graft.Names.quoted _
    val allTerms = queries.flatMap(_._2).distinct

    // Skinny (doc_id, dl) projection: consumed by the stats aggregate
    // and the per-doc norm join — cache the 2-column frame, never text.
    val dl = Caches.persistTracked(
      docs.select(col(q(idCol)).as("doc_id"),
        TextAnalysis.tokenCount(col(q(textCol))).cast("bigint").as("dl")))
    val stats = dl.agg(count(lit(1)).as("d"),
      coalesce(sum(col("dl")), lit(0L)).as("tl")).head
    val d = math.max(stats.getLong(0), 1L)
    val tl = math.max(stats.getLong(1), 1L)

    // Query-term tf: the isin filter runs scan-side, so only tokens of
    // the ≤|allTerms| query vocabulary reach the (doc_id, w) shuffle.
    val tf = Caches.persistTracked(
      TextAnalysis.explodedTokens(docs, idCol, textCol)
        .filter(col("w").isin(allTerms: _*))
        .groupBy(col("doc_id"), col("w"))
        .agg(count(lit(1)).as("tf")))
    // df per term: ≤|allTerms| rows to the driver (bounded collect),
    // idf computed BigInt-exactly, shipped back as a broadcast join.
    val idf = tf.groupBy(col("w")).agg(count(lit(1)).as("df")).collect()
      .map(r => (r.getString(0), idfQ4(d, r.getLong(1)))).toSeq
      .toDF("w", "idf_q4")

    val s = NormScale
    val norm = dl.select(col("doc_id"),
      expr(s"(dl * ${d}L * ${s}L) div ${tl}L").as("norm_s"))
    val qids = queries.map(_._1).zipWithIndex.map { case (l, i) => (l, i.toLong) }
    require(qids.map(_._1).distinct.size == qids.size, "query labels must be unique")
    val qidOf = qids.toMap
    val queryDf = queries.flatMap { case (label, ts) =>
      ts.distinct.map(w => (qidOf(label), w))
    }.toDF("qid", "w")

    val scored = tf
      .join(broadcast(idf), Seq("w"))
      .join(norm, Seq("doc_id"))
      .join(broadcast(queryDf), Seq("w"))
      .select(col("qid").as("query_id"), col("doc_id").as("vec_id"),
        (col("idf_q4") *
          expr(s"(1000000L * 22L * tf * ${s}L) div " +
            s"(10L * tf * ${s}L + 3L * ${s}L + 9L * norm_s)")).as("term_fp"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("term_fp")).as("dot_fp"))
    val labels = qids.map(_.swap).toDF("query_id", "label")
    Similarity.topKPerQuery(scored, k)
      .join(broadcast(labels), Seq("query_id"))
      .select(col("label").as("query_id"), col("vec_id").as("doc_id"),
        col("dot_fp").as("score_fp"), col("rn"))
  }
}
