package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[MinHashLSH.indexDelta]]'s exactness contract: the folded index is
  * row-identical to a full rebuild over the union corpus, across every
  * bucket-cap transition — under cap, crossing the cap on the fold
  * (old rows must EVICT), already over the cap at build (must stay
  * dropped), and arrival-only buckets on both sides of the cap.
  */
class SigIndexDeltaSpec extends AnyFunSuite with SparkTestSession {

  private val N = 4 // numHashes
  private val Cap = 2

  private def df(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def bandRows(ix: MinHashLSH.SigIndex): Set[(Long, Int, String)] =
    ix.bands.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet

  private def countRows(ix: MinHashLSH.SigIndex): Set[(Int, String, Long)] =
    ix.counts.collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet

  private def setKeys(ix: MinHashLSH.SigIndex): Set[Long] =
    ix.sets.select(col("doc_id")).collect().map(_.getLong(0)).toSet

  private def evictedRows(df: DataFrame): Set[(Long, Int, String)] =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet

  private def assertEqualIndex(got: MinHashLSH.SigIndex,
      want: MinHashLSH.SigIndex): Unit = {
    assert(bandRows(got) === bandRows(want), "bands diverged from rebuild")
    assert(countRows(got) === countRows(want), "counts diverged from rebuild")
    assert(setKeys(got) === setKeys(want), "sets diverged from rebuild")
    // the cold tier is part of the fold == rebuild contract too: after
    // any fold it must hold EXACTLY the over-cap buckets' rows a
    // rebuild would evict (else a later erase resurrects from a stale
    // tier)
    (got.evicted, want.evicted) match {
      case (Some(g), Some(w)) =>
        assert(evictedRows(g) === evictedRows(w),
          "cold tier diverged from rebuild's evicted rows")
      case (None, None) => ()
      case (g, w) => fail(s"tier presence diverged: got=${g.isDefined} " +
        s"want=${w.isDefined}")
    }
  }

  test("fold == rebuild across every planted cap transition") {
    // identical texts share every band bucket, so bucket populations
    // are exactly the copy counts
    val old = df(
      (1L, "alpha beta gamma"), (2L, "alpha beta gamma"), // at cap
      (3L, "delta epsilon zeta"),                         // under cap
      (4L, "eta theta iota"), (5L, "eta theta iota"),
      (6L, "eta theta iota"))                             // over cap at build
    val arrivals = df(
      (10L, "alpha beta gamma"),                       // pushes A past cap
      (11L, "delta epsilon zeta"),                     // B lands AT cap
      (12L, "kappa lambda mu"), (13L, "kappa lambda mu"),
      (14L, "kappa lambda mu"),                        // arrival-only, over
      (15L, "nu xi omicron"))                          // arrival-only, under
    val oldIx = MinHashLSH.signatureIndex(old, "doc_id", "text", 2, N, 1, Cap)
    val folded = MinHashLSH.indexDelta(oldIx, arrivals, "doc_id", "text",
      2, N, 1, Cap)
    val rebuilt = MinHashLSH.signatureIndex(old.unionByName(arrivals),
      "doc_id", "text", 2, N, 1, Cap)
    assertEqualIndex(folded, rebuilt)

    val docsKept = bandRows(folded).map(_._1)
    // the crossed-cap bucket evicted its OLD rows too
    assert(!docsKept.contains(1L) && !docsKept.contains(2L) &&
      !docsKept.contains(10L), "cap-crossing bucket failed to evict")
    // the at-cap bucket kept both sides
    assert(docsKept.contains(3L) && docsKept.contains(11L))
    // over-cap-at-build stays dropped; arrival-only respects the cap
    assert(!docsKept.exists(Set(4L, 5L, 6L, 12L, 13L, 14L)))
    assert(docsKept.contains(15L))
    // counts carry the FULL populations, evicted buckets included
    assert(countRows(folded).map(_._3).max === 3L)
  }

  test("folds compose: two batches == one rebuild (the q279 discipline)") {
    def slice(lo: Long, hi: Long) = df((lo until hi).map(i =>
      (i, s"w${i % 5} w${(i * 3) % 7} w${(i * 5) % 4}")): _*)
    val e0 = MinHashLSH.signatureIndex(slice(0, 20), "doc_id", "text",
      2, N, 1, Cap)
    val f1 = MinHashLSH.indexDelta(e0, slice(20, 30), "doc_id", "text",
      2, N, 1, Cap)
    val f2 = MinHashLSH.indexDelta(f1, slice(30, 40), "doc_id", "text",
      2, N, 1, Cap)
    val rebuilt = MinHashLSH.signatureIndex(slice(0, 40), "doc_id", "text",
      2, N, 1, Cap)
    assertEqualIndex(f2, rebuilt)
  }

  test("cap <= 0 disables eviction but still maintains exact counts") {
    val old = df((1L, "a b c"), (2L, "a b c"), (3L, "a b c"))
    val folded = MinHashLSH.indexDelta(
      MinHashLSH.signatureIndex(old, "doc_id", "text", 2, N, 1, 0),
      df((4L, "a b c")), "doc_id", "text", 2, N, 1, 0)
    val rebuilt = MinHashLSH.signatureIndex(
      old.unionByName(df((4L, "a b c"))), "doc_id", "text", 2, N, 1, 0)
    assertEqualIndex(folded, rebuilt)
    assert(bandRows(folded).size === 4 * N)
  }

  // ------------------------- indexErase -------------------------

  private def eraseIds(ids: Long*): DataFrame = {
    import spark.implicits._
    ids.toDF("doc_id")
  }

  test("erase == rebuild-without across every planted cap transition") {
    // identical texts share every bucket; populations == copy counts
    val corpus = df(
      (1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "alpha beta gamma"),                          // A: over cap
      (4L, "delta epsilon zeta"), (5L, "delta epsilon zeta"), // B: at cap
      (6L, "eta theta iota"), (7L, "eta theta iota"),
      (8L, "eta theta iota"), (9L, "eta theta iota"),    // C: far over cap
      (10L, "kappa lambda mu"))                          // D: singleton
    val built = MinHashLSH.signatureIndex(corpus, "doc_id", "text",
      2, N, 1, Cap)
    // erase 1 (pulls A back to cap → RESURRECT 2,3), 4 (B shrinks,
    // 5 passes through), 6 (C stays over cap → still empty), 10
    // (D's buckets disappear from counts entirely)
    val erased = MinHashLSH.indexErase(built, eraseIds(1L, 4L, 6L, 10L),
      N, 1, Cap)
    val rebuilt = MinHashLSH.signatureIndex(
      corpus.filter(!col("doc_id").isin(1L, 4L, 6L, 10L)),
      "doc_id", "text", 2, N, 1, Cap)
    assertEqualIndex(erased, rebuilt)
    val kept = bandRows(erased).map(_._1)
    assert(kept.contains(2L) && kept.contains(3L),
      "under-cap transition failed to resurrect surviving rows")
    assert(kept.contains(5L), "shrunk at-cap bucket lost a survivor")
    assert(!kept.exists(Set(7L, 8L, 9L)),
      "still-over-cap bucket resurrected evicted rows")
    assert(!kept.exists(Set(1L, 4L, 6L, 10L)), "erased doc row leaked")
    // counts shrink exactly; fully-erased buckets vanish
    assert(countRows(erased) === countRows(rebuilt))
  }

  test("erase is idempotent and a no-op for absent ids") {
    val corpus = df((1L, "a b c"), (2L, "d e f"), (3L, "a b c"))
    val built = MinHashLSH.signatureIndex(corpus, "doc_id", "text",
      2, N, 1, Cap)
    val once = MinHashLSH.indexErase(built, eraseIds(2L, 999L), N, 1, Cap)
    val twice = MinHashLSH.indexErase(once, eraseIds(2L, 999L), N, 1, Cap)
    val rebuilt = MinHashLSH.signatureIndex(
      corpus.filter(col("doc_id") =!= 2L), "doc_id", "text", 2, N, 1, Cap)
    assertEqualIndex(once, rebuilt)
    assertEqualIndex(twice, rebuilt)
  }

  test("erase folds compose with appends: re-crawl = erase then fold") {
    def slice(lo: Long, hi: Long) = df((lo until hi).map(i =>
      (i, s"w${i % 5} w${(i * 3) % 7} w${(i * 5) % 4}")): _*)
    val built = MinHashLSH.signatureIndex(slice(0, 30), "doc_id", "text",
      2, N, 1, Cap)
    // re-crawl docs 10..19 with changed text: erase them, fold the
    // new versions back in (same ids — legal AFTER the erase)
    val recrawled = df((10L until 20L).map(i =>
      (i, s"v${i % 3} v${(i * 7) % 5} v${(i * 2) % 6}")): _*)
    val folded = MinHashLSH.indexDelta(
      MinHashLSH.indexErase(built, eraseIds(10L until 20L: _*), N, 1, Cap),
      recrawled, "doc_id", "text", 2, N, 1, Cap)
    val rebuilt = MinHashLSH.signatureIndex(
      slice(0, 10).unionByName(slice(20, 30)).unionByName(recrawled),
      "doc_id", "text", 2, N, 1, Cap)
    assertEqualIndex(folded, rebuilt)
  }

  test("pre-cold-tier artifact (evicted = None) falls back to re-banding " +
      "and still matches rebuild") {
    val corpus = df(
      (1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "alpha beta gamma"),                              // over cap
      (4L, "delta epsilon zeta"), (5L, "delta epsilon zeta"))
    val built0 = MinHashLSH.signatureIndex(corpus, "doc_id", "text",
      2, N, 1, Cap)
    val legacy = MinHashLSH.SigIndex(built0.bands, built0.counts,
      built0.sets, None)
    val erased = MinHashLSH.indexErase(legacy, eraseIds(1L), N, 1, Cap)
    val rebuilt = MinHashLSH.signatureIndex(
      corpus.filter(col("doc_id") =!= 1L), "doc_id", "text", 2, N, 1, Cap)
    assert(bandRows(erased) === bandRows(rebuilt))
    assert(countRows(erased) === countRows(rebuilt))
    assert(setKeys(erased) === setKeys(rebuilt))
    assert(erased.evicted.isEmpty,
      "a legacy index cannot grow a tier mid-erase")
    val kept = bandRows(erased).map(_._1)
    assert(kept.contains(2L) && kept.contains(3L),
      "fallback resurrection failed")
  }

  test("cold tier makes erase resurrection an id lookup: exactly one " +
      "minhash_sigs in the erase plan (the erase-side re-band), none " +
      "over the surviving corpus") {
    val corpus = df(
      (1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "alpha beta gamma"),
      (4L, "delta epsilon zeta"), (5L, "delta epsilon zeta"))
    val built = MinHashLSH.signatureIndex(corpus, "doc_id", "text",
      2, N, 1, Cap)
    // pin the frames so the build lineage (which DOES re-band) can't
    // leak into the erase plan under inspection — a loaded artifact
    // is exactly this shape
    val loaded = MinHashLSH.SigIndex(built.bands.localCheckpoint(),
      built.counts.localCheckpoint(), built.sets.localCheckpoint(),
      built.evicted.map(_.localCheckpoint()))
    def sigsIn(dfr: DataFrame): Int =
      "minhash_sigs".r.findAllIn(
        dfr.queryExecution.optimizedPlan.toString).length
    val cold = MinHashLSH.indexErase(loaded, eraseIds(1L), N, 1, Cap)
    assert(sigsIn(cold.bands) === 1,
      "cold-tier erase must re-band ONLY the erase set")
    val legacy = MinHashLSH.indexErase(
      MinHashLSH.SigIndex(loaded.bands, loaded.counts, loaded.sets, None),
      eraseIds(1L), N, 1, Cap)
    assert(sigsIn(legacy.bands) >= 2,
      "fallback path should show the corpus re-band the tier removes")
    // and the cold plan still produces the exact rebuild image
    val rebuilt = MinHashLSH.signatureIndex(
      corpus.filter(col("doc_id") =!= 1L), "doc_id", "text", 2, N, 1, Cap)
    assert(bandRows(cold) === bandRows(rebuilt))
  }

  test("eraseImpact reports live rows and resurrection triggers") {
    val corpus = df(
      (1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "alpha beta gamma"),      // over cap by one → resurrection
      (4L, "delta epsilon zeta"))    // under cap → live rows
    val built = MinHashLSH.signatureIndex(corpus, "doc_id", "text",
      2, N, 1, Cap)
    val impact = MinHashLSH.eraseImpact(eraseIds(1L, 4L, 999L), "doc_id",
        built.sets, built.counts, N, 1, Cap)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(impact(1L).getBoolean(1) && impact(4L).getBoolean(1))
    assert(!impact(999L).getBoolean(1) &&
      impact(999L).getLong(3) === 0L, "absent id must read zero bands")
    // doc 1's buckets sit at cap+1 → every band is a resurrection
    // trigger and none of its rows are live in the capped frame
    assert(impact(1L).getLong(4) === 0L)
    assert(impact(1L).getLong(5) === N.toLong)
    // doc 4's buckets are under cap → all live, no resurrections
    assert(impact(4L).getLong(4) === N.toLong)
    assert(impact(4L).getLong(5) === 0L)
  }
}
