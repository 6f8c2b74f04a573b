package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** BPE training: hand-computed merge sequence, greedy-replace
  * semantics, exhaustion, and the no-token contract. */
class BpeSpec extends AnyFunSuite with SparkTestSession {

  private def docsOf(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("merge table matches the hand-computed BPE run") {
    // words: aaab ×2, ab ×1
    val docs = docsOf("aaab aaab", "ab")
    val merges = BpeTrainer.trainMerges(docs, "doc_id", "text", nMerges = 3)
    // round 1: (a,a) count 4 (two positions in aaab, freq 2) beats (a,b)=3
    // round 2: after [aa][a][b]: (a,b)=2+1=3 beats (aa,a)=2
    // round 3: after [aa][ab]/[ab]: (aa,ab)=2
    assert(merges === Seq(("a", "a", 4L), ("a", "b", 3L), ("aa", "ab", 2L)))
  }

  test("symbolCounts: full merge collapses words; nMerges=0 counts chars") {
    val docs = docsOf("aaab aaab ab", "", "aaab")
    val after = BpeTrainer.symbolCounts(docs, "doc_id", "text", nMerges = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // aaab → [aaab] (1 symbol), ab → [ab] (1 symbol)
    assert(after(0L) === ((3L, 3L)))
    assert(after(1L) === ((0L, 0L)))
    assert(after(2L) === ((1L, 1L)))
    val raw = BpeTrainer.symbolCounts(docs, "doc_id", "text", nMerges = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(raw(0L) === 10L) // 4 + 4 + 2 chars
    assert(raw(2L) === 4L)
  }

  test("vocab: symbol mass and dense (mass desc, symbol asc) ids") {
    // after 3 merges on aaab×2 + ab: final symbols aaab→[aa][ab]→[aaab],
    // ab→[ab]. Masses: aaab=2, ab=1
    val docs = docsOf("aaab aaab", "ab")
    val v = BpeTrainer.vocab(docs, "doc_id", "text", nMerges = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(v === Set(("aaab", 2L, 1L), ("ab", 1L, 2L)))
    // nMerges=0: char vocabulary; ids break mass ties lexicographically
    val v0 = BpeTrainer.vocab(docs, "doc_id", "text", nMerges = 0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // chars: a mass 2·3+1 = 7, b mass 2+1 = 3
    assert(v0 === Set(("a", 7L, 1L), ("b", 3L, 2L)))
  }

  test("greedy leftmost merge: a run of equal symbols pairs like BPE") {
    // aaaa: round-1 (a,a) has count 3; replace is leftmost
    // non-overlapping → [aa][aa], 2 symbols
    val docs = docsOf("aaaa")
    val merges = BpeTrainer.trainMerges(docs, "doc_id", "text", nMerges = 1)
    assert(merges === Seq(("a", "a", 3L)))
    val counts = BpeTrainer.symbolCounts(docs, "doc_id", "text", nMerges = 1)
      .collect().map(r => r.getLong(2))
    assert(counts.toSeq === Seq(2L))
  }

  test("training exhausts gracefully when no pairs remain") {
    val docs = docsOf("a b c", "b c")
    val merges = BpeTrainer.trainMerges(docs, "doc_id", "text", nMerges = 5)
    assert(merges.isEmpty)
    val counts = BpeTrainer.symbolCounts(docs, "doc_id", "text", nMerges = 5)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(counts === Set((3L, 3L), (2L, 2L)))
  }

  test("encode reproduces each word's final training symbols") {
    // after 3 merges on aaab×2 + ab: aaab→[aaab] (id 1), ab→[ab] (id 2)
    val docs = docsOf("aaab aaab", "ab")
    val enc = BpeTrainer.encode(docs, "doc_id", "text", nMerges = 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(enc(0L) === (("1 1", 2L)))
    assert(enc(1L) === (("2", 1L)))
  }

  test("encode: reading-order id assembly, token-less docs, nMerges=0") {
    // char vocabulary: masses a=2, b=3 → b id 1, a id 2
    val docs = docsOf("ab ba", "", "b")
    val enc = BpeTrainer.encode(docs, "doc_id", "text", nMerges = 0)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(enc(0L) === (("2 1 1 2", 4L))) // [a][b] then [b][a], in order
    assert(enc(1L) === (("", 0L)))
    assert(enc(2L) === (("1", 1L)))
  }

  test("pre-trained encode: unseen symbols surface as null and still count") {
    // train to full collapse on aaab — vocabulary is exactly {aaab}
    val train = docsOf("aaab aaab")
    val merges = BpeTrainer.trainMerges(train, "doc_id", "text", nMerges = 3)
    val vocab = BpeTrainer.vocab(train, "doc_id", "text", nMerges = 3)
    // held-out corpus: aaab encodes to its training symbol; ac stays
    // [a][c] — both symbols unseen → literal null ids, counted
    val held = docsOf("aaab ac")
    val enc = BpeTrainer.encode(held, "doc_id", "text", merges, vocab)
      .collect().map(r => (r.getString(1), r.getLong(2)))
    assert(enc.toSeq === Seq(("1 null null", 3L)))
  }

  test("decode inverts encode exactly for in-vocab text; unknown ids refuse") {
    import org.apache.spark.sql.functions.col
    // train on a small real-ish corpus, encode the SAME corpus (every
    // symbol in-vocab by construction), decode word-by-word: the
    // round-trip identity decode(encode(w)) == w must hold for every
    // distinct word
    val train = docsOf("the table the table scan", "scan the hash table")
    val merges = BpeTrainer.trainMerges(train, "doc_id", "text", 3)
    val vocab = BpeTrainer.vocab(train, "doc_id", "text", 3)
      .select(col("sym"), col("sym_id"))
    import spark.implicits._
    val words = Seq("the", "table", "scan", "hash")
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val enc = BpeTrainer.encode(words, "doc_id", "text", merges, vocab)
    val dec = BpeTrainer.decodeIds(
        enc.join(words, Seq("doc_id")), Seq("doc_id", "text"), "token_ids",
        vocab)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(dec.length === 4)
    dec.foreach { case (w, decoded, nUnknown) =>
      assert(nUnknown === 0L, s"'$w' is in-vocab — no unknown ids")
      assert(decoded === w, s"decode(encode('$w')) must be '$w'")
    }
    // an id sequence with the null placeholder (unseen symbol) is
    // LOSSY: decoded refuses (NULL), n_unknown counts it
    val lossy = BpeTrainer.decodeIds(
        Seq((99L, "1 null")).toDF("doc_id", "token_ids"),
        Seq("doc_id"), "token_ids", vocab)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2)))
    assert(lossy.toSeq === Seq((99L, None, 1L)))
  }

  test("partition-invariant merges") {
    import org.apache.spark.sql.functions.col
    val docs = docsOf("the table the table scan", "scan the hash table",
      "hash join hash join", "merge sort merge")
    val a = BpeTrainer.trainMerges(docs.repartition(1), "doc_id", "text", 4)
    val b = BpeTrainer.trainMerges(docs.repartition(9), "doc_id", "text", 4)
    assert(a === b && a.size === 4)
    val ca = BpeTrainer.symbolCounts(docs.repartition(1), "doc_id", "text", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val cb = BpeTrainer.symbolCounts(docs.repartition(9), "doc_id", "text", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(ca === cb)
  }
}
