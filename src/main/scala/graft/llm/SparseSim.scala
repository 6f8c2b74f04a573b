package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** All-pairs sparse similarity: every document pair whose cosine over
  * term-frequency vectors clears a threshold, computed through the
  * inverted index — the third dedup geometry next to MinHash (set
  * Jaccard) and SimHash (hamming): weighted bag-of-words similarity,
  * the shape TF-IDF-era near-dup and template detection use.
  *
  * Pipeline: term frequencies → document-frequency pruning (terms
  * with `df > maxDf` leave the vector space — the stopword-grade
  * posting lists that are both semantically empty and the quadratic
  * skew bomb) → postings self-join on the term → per-pair integer dot
  * product → integer threshold verify.
  *
  * Determinism: everything is integer. The cosine test
  * `dot/√(n2a·n2b) ≥ thr` is evaluated square-free as
  * `dot²·10¹² ≥ thrPpm²·n2a·n2b` in decimal(38,0) arithmetic, so no
  * square root ever runs; `cos2_ppm = ⌊dot²·10⁶/(n2a·n2b)⌋` is the
  * reported score (monotone in cosine since tf dots are ≥ 0). Bound:
  * needs `n2a·n2b·10¹² < 10³⁸`, i.e. per-doc `Σtf² < 10¹³` — ~3M
  * repetitions of one token before overflow, far past any real doc.
  *
  * 100 TB shape: one shuffle keys postings by term (bounded fan-out —
  * a term contributes at most `maxDf²/2` pairs by construction), one
  * shuffle keys partial products by pair. No pair of documents ever
  * meets except through a shared surviving term, and text never rides
  * the pair exchange — only (id, tf).
  */
object SparseSim {

  /** `(doc_a, doc_b, dot, n2_a, n2_b, cos2_ppm)` for every pair with
    * cosine ≥ thrPpm/1e6 over the df-pruned tf vectors; `doc_a <
    * doc_b`. Norms are over surviving terms only (pruning changes the
    * vector space, by contract). */
  def allPairsCosine(docs: DataFrame, idCol: String, textCol: String,
      maxDf: Long, thrPpm: Long): DataFrame = {
    require(maxDf > 0, "maxDf must be positive")
    require(thrPpm > 0 && thrPpm <= 1000000L, "thrPpm must be in (0, 1e6]")
    val q = graft.Names.quoted _
    // Spread before the tokenize fold — serial on a single-split scan
    // otherwise (no-op on a parallel scan)
    val tf = Spread(docs.select(col(q(idCol)).as("doc_id"),
        col(q(textCol)).as("__t")))
      .select(col("doc_id"),
        explode(TextAnalysis.tokens(col("__t"))).as("w"))
      .groupBy(col("w"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    // df pruning as a broadcast ANTI-join against the heavy-term
    // blocklist: the blocklist is small by construction (≤ corpus
    // postings / maxDf terms can exceed the cap), so hot terms are
    // filtered MAP-SIDE — their postings never congregate in one
    // partition just to be counted and discarded (a per-term window
    // would buffer a stopword's entire posting list in one task).
    val heavy = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf).select(col("w"))
    val kept = tf.join(broadcast(heavy), Seq("w"), "left_anti")
      .select(col("w"), col("doc_id"), col("tf"))
    val n2 = kept.groupBy(col("doc_id"))
      .agg(sum(col("tf") * col("tf")).as("n2"))
    val pairs = kept.as("a")
      .join(kept.as("b"),
        col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(sum(col("a.tf") * col("b.tf")).as("dot"))
    val d = (c: String) => col(c).cast("decimal(38,0)")
    val ppm = lit(1000000L).cast("decimal(38,0)")
    pairs
      .join(n2.select(col("doc_id").as("doc_a"), col("n2").as("n2_a")), Seq("doc_a"))
      .join(n2.select(col("doc_id").as("doc_b"), col("n2").as("n2_b")), Seq("doc_b"))
      .filter(d("dot") * d("dot") * ppm * ppm >=
        lit(thrPpm).cast("decimal(38,0)") * lit(thrPpm) * d("n2_a") * d("n2_b"))
      .select(col("doc_a"), col("doc_b"), col("dot"),
        col("n2_a"), col("n2_b"),
        floor((d("dot") * d("dot") * ppm) / (d("n2_a") * d("n2_b")))
          .cast("bigint").as("cos2_ppm"))
  }

  /** Asymmetric containment join: directed pairs where the contained
    * document's distinct word-3-gram set lies (mostly) inside the
    * container's — `|S_a ∩ S_b| ≥ thrPpm/1e6 · |S_a|`. This is the
    * dup geometry Jaccard-based near-dup MISSES by construction: a
    * paragraph quoted inside a much longer document has tiny Jaccard
    * (the union is huge) but containment ≈ 1. Docs with fewer than 3
    * tokens have no 3-grams and never participate.
    *
    * Same engine shape as [[allPairsCosine]]: distinct grams →
    * df pruning (grams in more than `maxDf` docs leave the space — the
    * boilerplate that is both meaningless and the skew bomb) →
    * postings self-join → per-ordered-pair shared count → integer
    * verify, evaluated in BOTH directions from each undirected pair
    * so the pair exchange is not doubled. All arithmetic fits plain
    * longs (shared·10⁶ is bounded by a doc's gram count · 10⁶). */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
      maxDf: Long, thrPpm: Long): DataFrame = {
    require(maxDf > 0, "maxDf must be positive")
    require(thrPpm > 0 && thrPpm <= 1000000L, "thrPpm must be in (0, 1e6]")
    val q = graft.Names.quoted _
    // Spread before the tokenize/3-gram fold — serial on a
    // single-split scan otherwise (no-op on a parallel scan)
    val grams = Spread(docs.select(col(q(idCol)).as("doc_id"),
        col(q(textCol)).as("__t")))
      .select(col("doc_id"), TextAnalysis.tokens(col("__t")).as("toks"))
      .select(col("doc_id"),
        explode(TextAnalysis.word3grams("toks")).as("g"))
      .distinct()
    // same broadcast-blocklist pruning shape as [[allPairsCosine]]
    val heavy = grams.groupBy(col("g")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf).select(col("g"))
    val kept = grams.join(broadcast(heavy), Seq("g"), "left_anti")
      .select(col("g"), col("doc_id"))
    val sizes = kept.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
    val pairs = kept.as("a")
      .join(kept.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_grams").as("n_a")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_grams").as("n_b")), Seq("doc_b"))
    // Both directions emitted from ONE pass over the pair aggregate
    // (explode of a 2-struct array), instead of a unionAll whose two
    // branches each re-ran the postings join + pair aggregate + both
    // size joins (r19: the duplicated subtree was the whole plan's
    // cost twice; ReuseExchange only shared the shuffles, not the
    // joins/aggregates above them). Same rows, order-free.
    pairs
      .select(explode(array(
        struct(col("doc_a").as("contained_id"),
          col("doc_b").as("container_id"), col("shared"),
          col("n_a").as("n_contained")),
        struct(col("doc_b").as("contained_id"),
          col("doc_a").as("container_id"), col("shared"),
          col("n_b").as("n_contained")))).as("r"))
      .select(col("r.contained_id").as("contained_id"),
        col("r.container_id").as("container_id"),
        col("r.shared").as("shared"),
        col("r.n_contained").as("n_contained"))
      .filter(col("shared") * 1000000L >= lit(thrPpm) * col("n_contained"))
      .select(col("contained_id"), col("container_id"), col("shared"),
        col("n_contained"),
        expr("(shared * 1000000L) div n_contained").as("cont_ppm"))
  }
}
