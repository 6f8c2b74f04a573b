package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic BPE tokenizer training (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units") —
  * the train-the-tokenizer-on-the-corpus step a data pipeline runs
  * before it can count tokens at all. Each round finds the most
  * frequent adjacent symbol pair over the word-frequency table and
  * merges it corpus-wide; ties break lexicographically, counts are
  * integers, so the learned merge table is a pure function of the
  * corpus and the oracle replays every round as an unrolled CTE
  * (`q88_bpe_train`).
  *
  * Symbol sequences are stored as BRACKET-WRAPPED strings
  * (`table` → `[t][a][b][l][e]`): a merge is then one literal
  * `replace(s, "[l][r]", "[lr]")`, which both Spark and DuckDB apply
  * leftmost-non-overlapping — exactly BPE's greedy scan, and adjacent
  * matches share no characters so a run of equal pairs merges
  * pairwise like the reference algorithm. Words containing brackets
  * would degrade gracefully (identical string ops both engines), the
  * corpus contract keeps them out.
  *
  * 100 TB shape: training runs entirely on the `(word, freq)`
  * aggregate — bounded by DISTINCT words, the one corpus artifact
  * cheap enough to iterate on (the q71 vocabulary precedent); each
  * round is one aggregation over exploded adjacent pairs plus a
  * TakeOrdered(1), with a single 2-string row reaching the driver;
  * applying the tokenizer back to documents is a broadcast join of
  * the word→symbol-count table. */
object BpeTrainer {

  private def wrapExpr(wCol: String) =
    expr(s"array_join(transform(split($wCol, ''), c -> concat('[', c, ']')), '')")

  private val symsExpr = "split(substring(s, 2, length(s) - 2), '\\\\]\\\\[')"

  private def sq(lit: String): String = "'" + lit.replace("'", "''") + "'"

  /** One training round: the winning pair (count desc, pair asc) over
    * the current symbol strings, or None when no word has ≥2 symbols
    * left. */
  private def bestPair(cur: DataFrame): Option[(String, String, Long)] = {
    val top = cur.select(col("freq"), expr(symsExpr).as("y"))
      // single-symbol words have no pairs — and Spark's sequence(1, 0)
      // DESCENDS, so the transform below would index out of bounds
      .filter(size(col("y")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(sequence(1, size(y) - 1), " +
          "i -> struct(element_at(y, i) AS l, element_at(y, i + 1) AS r))")).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("freq")).as("c"))
      .orderBy(col("c").desc, col("l").asc, col("r").asc)
      .limit(1).collect()
    top.headOption.map(r => (r.getString(0), r.getString(1), r.getLong(2)))
  }

  /** The learned merge table `(left, right, pair_count)` after
    * `nMerges` rounds over the corpus's word-frequency table, plus
    * the final per-word symbol strings. */
  private def trainOn(words: DataFrame, nMerges: Int)
      : (Seq[(String, String, Long)], DataFrame) = {
    var cur = words.select(col("w"), col("freq"), wrapExpr("w").as("s"))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var exhausted = false
    for (_ <- 0 until nMerges if !exhausted) {
      bestPair(cur) match {
        case Some((l, r, c)) =>
          merges += ((l, r, c))
          cur = cur.withColumn("s", expr(
            s"replace(s, ${sq(s"[$l][$r]")}, ${sq(s"[$l$r]")})"))
        case None => exhausted = true
      }
    }
    (merges.toSeq, cur)
  }

  private def wordFreq(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    Caches.persistTracked(
      TextAnalysis.tokenFreq(TextAnalysis.explodedTokens(docs, idCol, textCol))
        .withColumnRenamed("c", "freq"))

  /** The merge table alone: `(left, right, pair_count)` in learn
    * order. */
  def trainMerges(docs: DataFrame, idCol: String, textCol: String,
      nMerges: Int): Seq[(String, String, Long)] = {
    require(nMerges >= 0, "nMerges must be non-negative")
    trainOn(wordFreq(docs, idCol, textCol), nMerges)._1
  }

  /** The learned vocabulary — the artifact an encoder actually ships:
    * every distinct final symbol with its corpus occurrence mass
    * (Σ word_freq × in-word occurrences) and a dense id assigned by
    * (mass desc, symbol asc). The frame is vocabulary-sized by
    * construction (bounded by distinct symbols, not corpus rows), so
    * the global rank window is a bounded single-task sort — the same
    * contract as the q36 top-terms rank. */
  def vocab(docs: DataFrame, idCol: String, textCol: String,
      nMerges: Int): DataFrame = {
    require(nMerges >= 0, "nMerges must be non-negative")
    val (_, fin) = trainOn(wordFreq(docs, idCol, textCol), nMerges)
    val occ = fin.select(col("freq"), explode(expr(symsExpr)).as("sym"))
      .groupBy(col("sym")).agg(sum(col("freq")).as("n_occ"))
    occ.select(col("sym"), col("n_occ"),
      row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("n_occ").desc, col("sym").asc))
        .cast("bigint").as("sym_id"))
  }

  /** Per-document tokenization stats under the trained merges:
    * `(doc_id, n_tok, n_sym)` — whitespace tokens and total BPE
    * symbols after `nMerges` rounds (no-token docs report 0/0). */
  def symbolCounts(docs: DataFrame, idCol: String, textCol: String,
      nMerges: Int): DataFrame = {
    require(nMerges >= 0, "nMerges must be non-negative")
    val q = graft.Names.quoted _
    val (_, fin) = trainOn(wordFreq(docs, idCol, textCol), nMerges)
    val nsym = fin.select(col("w"),
      expr(s"cast(size($symsExpr) as bigint)").as("n_sym"))
    val scored = TextAnalysis.explodedTokens(docs, idCol, textCol)
      .join(broadcast(nsym), Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"), sum(col("n_sym")).as("n_sym"))
    docs.select(col(q(idCol)).as("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tok"), lit(0L)).as("n_tok"),
        coalesce(col("n_sym"), lit(0L)).as("n_sym"))
  }
}
