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

  /** Split a bracket-wrapped symbol string back into its symbols —
    * over any SQL expression (column or lambda variable). */
  private[graft] def symsOfSql(sExpr: String): String =
    s"split(substring($sExpr, 2, length($sExpr) - 2), '\\\\]\\\\[')"

  private val symsExpr = symsOfSql("s")

  private def sq(lit: String): String = "'" + lit.replace("'", "''") + "'"

  /** The trained tokenizer as ONE SQL scalar over a word-valued
    * expression: bracket-wrap, then one literal replace per learned
    * merge in rank order — the exact chain training applied. Shared
    * by the batch encode and the streaming ingest twin so the two can
    * never drift. */
  private[graft] def encodeWordSql(merges: Seq[(String, String, Long)],
      wExpr: String): String =
    merges.foldLeft(
      s"array_join(transform(split($wExpr, ''), c -> concat('[', c, ']')), '')") {
      case (acc, (l, r, _)) =>
        s"replace($acc, ${sq(s"[$l][$r]")}, ${sq(s"[$l$r]")})"
    }

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

  /** Memoized training — a pure function of (corpus plan, columns,
    * nMerges), and four consumers (merge table q88, vocab q99, encode
    * q137, packing counts q140) train the IDENTICAL tokenizer: train
    * once per session, like the IVF codebook memo. Clears with
    * `Caches.unpersistAll`, so min-over-iterations benches still
    * price the training rounds. */
  private def trained(docs: DataFrame, idCol: String, textCol: String,
      nMerges: Int): (Seq[(String, String, Long)], DataFrame) =
    Caches.memoized(docs.sparkSession, ("bpe_train",
      docs.queryExecution.analyzed.canonicalized, idCol, textCol, nMerges)) {
      trainOn(wordFreq(docs, idCol, textCol), nMerges)
    }

  /** The merge table alone: `(left, right, pair_count)` in learn
    * order. */
  def trainMerges(docs: DataFrame, idCol: String, textCol: String,
      nMerges: Int): Seq[(String, String, Long)] = {
    require(nMerges >= 0, "nMerges must be non-negative")
    trained(docs, idCol, textCol, nMerges)._1
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
    vocabFrom(trained(docs, idCol, textCol, nMerges)._2)
  }

  private def vocabFrom(fin: DataFrame): DataFrame = {
    val occ = fin.select(col("freq"), explode(expr(symsExpr)).as("sym"))
      .groupBy(col("sym")).agg(sum(col("freq")).as("n_occ"))
    occ.select(col("sym"), col("n_occ"),
      row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("n_occ").desc, col("sym").asc))
        .cast("bigint").as("sym_id"))
  }

  /** ENCODE: apply a trained merge table to tokenize a corpus.
    *
    * This is the path that makes the tokenizer usable — training
    * (q88) learns the merges, `vocab` (q99) ships the symbol table,
    * and this applies them to text: every whitespace token is
    * bracket-wrapped and the merges are replayed IN RANK ORDER as the
    * same leftmost-non-overlapping literal replaces training used
    * (the semantics q88's oracle pins), then each resulting symbol is
    * looked up in the vocabulary for its dense id. Emits one row per
    * document: `(doc_id, token_ids, n_bpe_tokens)` with `token_ids`
    * the space-joined symbol-id sequence in reading order (empty
    * string / 0 for token-less docs).
    *
    * 100 TB shape: the merge chain is a driver-held list of literal
    * string pairs folded into ONE codegen'd projection over the
    * exploded token stream — no join, no state, embarrassingly
    * parallel; the only join is the broadcast of the
    * vocabulary-sized symbol table for id lookup (kilobytes-to-
    * megabytes, the artifact every real tokenizer broadcasts), and
    * the final per-doc assembly groups by the id the corpus is
    * already keyed by. Trains once, then delegates to the pre-trained
    * overload. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      nMerges: Int): DataFrame = {
    require(nMerges >= 0, "nMerges must be non-negative")
    val (merges, fin) = trained(docs, idCol, textCol, nMerges)
    encode(docs, idCol, textCol, merges,
      vocabFrom(fin).select(col("sym"), col("sym_id")))
  }

  /** ENCODE with a PRE-TRAINED tokenizer — `merges` in learn order
    * plus a `(sym, sym_id)` vocabulary (the `trainMerges`/`vocab`
    * artifacts). Training runs once, offline; this pass is a pure
    * codegen'd projection (the merge chain folded into one replace
    * expression) plus one broadcast LEFT join against the
    * vocabulary-sized id table, so a held-out corpus encodes without
    * re-touching the training corpus. Unseen-at-training words
    * degrade to whatever symbols the merge chain leaves (ultimately
    * single characters); symbols absent from the vocabulary still
    * COUNT toward `n_bpe_tokens` and surface as the literal `null`
    * placeholder in `token_ids` rather than silently dropping. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String, Long)], vocabIds: DataFrame): DataFrame = {
    val q = graft.Names.quoted _
    // the trained tokenizer as ONE expression ([[encodeWordSql]]), so
    // encode(w) for a training word reproduces its final training
    // symbols
    val encodeSql = encodeWordSql(merges, "w")
    // Spread before the per-token merge-chain fold: the replace chain
    // + split runs per token and a single-split scan would execute it
    // serial (no-op on a parallel scan, see [[Spread]])
    val perSym = Spread(docs
        .select(col(q(idCol)).as("doc_id"), col(q(textCol)).as("__t")))
      .select(col("doc_id"),
        posexplode(TextAnalysis.tokens(col("__t"))).as(Seq("pos", "w")))
      .select(col("doc_id"), col("pos"), expr(encodeSql).as("s"))
      .select(col("doc_id"), col("pos"),
        posexplode(expr(symsExpr)).as(Seq("spos", "sym")))
    val agg = perSym
      .join(broadcast(vocabIds.select(col("sym"), col("sym_id"))),
        Seq("sym"), "left")
      .groupBy(col("doc_id"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("pos"), col("spos"),
              col("sym_id")))),
            x => x.getField("sym_id").cast("string")),
          " ", "null").as("token_ids"),
        count(lit(1)).as("n_bpe_tokens"))
    docs.select(col(q(idCol)).as("doc_id")).join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("token_ids"), lit("")).as("token_ids"),
        coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"))
  }

  /** Per-document tokenization stats under the trained merges:
    * `(doc_id, n_tok, n_sym)` — whitespace tokens and total BPE
    * symbols after `nMerges` rounds (no-token docs report 0/0). */
  def symbolCounts(docs: DataFrame, idCol: String, textCol: String,
      nMerges: Int): DataFrame = {
    require(nMerges >= 0, "nMerges must be non-negative")
    val q = graft.Names.quoted _
    val (_, fin) = trained(docs, idCol, textCol, nMerges)
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

  /** DECODE: invert an id sequence back to text — one broadcast join
    * (`sym_id → sym`, the vocabulary read the other way) plus an
    * ordered concat. Symbols are bare character runs (no separators),
    * so concatenating a WORD's symbols reproduces the word exactly —
    * `decode(encode(w)) == w` whenever every symbol is in the
    * vocabulary (pinned in BpeSpec and graded corpus-wide by the q227
    * round-trip card). Ids with no vocabulary row (the literal `null`
    * placeholder [[encode]] emits for unseen-at-training symbols)
    * make the row LOSSY: `n_unknown > 0` and `decoded` NULL — decode
    * refuses to fabricate text it cannot prove.
    *
    * Input: `keyCols` plus `idsCol`, a space-joined sym_id string
    * (exactly [[encode]]'s `token_ids` shape). Output: the keys,
    * `decoded`, `n_unknown`. Row-local split/explode, one broadcast
    * of the vocabulary-sized id table, one key-grouped assembly —
    * the mirror image of encode's shape, no extra shuffle class. */
  def decodeIds(ids: DataFrame, keyCols: Seq[String], idsCol: String,
      vocabIds: DataFrame): DataFrame = {
    val q = graft.Names.quoted _
    val keys = keyCols.map(c => col(q(c)))
    val perId = ids
      .select(keys :+ posexplode(split(col(q(idsCol)), " "))
        .as(Seq("pos", "sid")): _*)
      // try_cast, not cast: encode's literal `null` placeholder (and
      // any other non-numeric id) must become a SQL NULL unknown, not
      // an ANSI cast error
      .withColumn("sym_id", expr("try_cast(sid as bigint)"))
      .join(broadcast(vocabIds.select(col("sym_id"), col("sym"))),
        Seq("sym_id"), "left")
    perId.groupBy(keys: _*)
      .agg(
        sum(when(col("sym").isNull, 1L).otherwise(0L)).as("n_unknown"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("pos"), col("sym")))),
            x => x.getField("sym")),
          "").as("__dec"))
      .select(keys ++ Seq(
        when(col("n_unknown") === 0L, col("__dec")).as("decoded"),
        col("n_unknown").cast("bigint").as("n_unknown")): _*)
  }
}
