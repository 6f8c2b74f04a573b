package graft.llm

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[MinHashLSH.capSweep]] (q314's skew-guard price card): each grid
  * cap's surviving-pair count must equal what the PRODUCTION capped
  * pipeline ([[MinHashLSH.nearDupPairs]] with `maxBucketSize`)
  * actually emits — the card prices the real guard, not a model of
  * it — plus monotonicity and the closed forms at the grid edges. */
class CapSweepSpec extends AnyFunSuite with SparkTestSession {

  private val ShingleN = 3
  private val NumHashes = 8

  private def df(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // two exact-dup families (guaranteed shared buckets) + a boilerplate
  // family large enough to produce an over-cap bucket + singletons
  private val corpus = df(
    (1L, "the quick brown fox jumps over the lazy dog tonight"),
    (2L, "the quick brown fox jumps over the lazy dog tonight"),
    (3L, "pack my box with five dozen fine liquor jugs today"),
    (4L, "pack my box with five dozen fine liquor jugs today"),
    (5L, "standard boilerplate legal disclaimer text block here now"),
    (6L, "standard boilerplate legal disclaimer text block here now"),
    (7L, "standard boilerplate legal disclaimer text block here now"),
    (8L, "standard boilerplate legal disclaimer text block here now"),
    (9L, "completely unrelated fresh document with new words inside"))

  private val caps = Seq(1L, 2L, 3L, 4L, 8L)

  private def sweep = MinHashLSH.capSweep(corpus, "doc_id", "text",
    ShingleN, NumHashes, 1, caps, 500000L).orderBy("cap").collect()

  test("each cap's surviving-pair count equals the production capped " +
      "pipeline's output") {
    val rows = sweep
    for (r <- rows) {
      val cap = r.getAs[Long]("cap")
      val prod = MinHashLSH.nearDupPairs(corpus, "doc_id", "text",
        shingleN = ShingleN, numHashes = NumHashes, rowsPerBand = 1,
        minJaccardFp = 0L, maxBucketSize = cap.toInt).count()
      assert(r.getAs[Long]("n_kept") === prod,
        s"cap=$cap: the card must price the real guard")
    }
  }

  test("the curve is monotone and the edges read their closed forms") {
    val rows = sweep
    def seqOf(c: String) = rows.map(_.getAs[Long](c)).toSeq
    assert(seqOf("n_kept") === seqOf("n_kept").sorted,
      "surviving pairs are non-decreasing in the cap")
    assert(seqOf("n_caught") === seqOf("n_caught").sorted,
      "caught true dups are non-decreasing in the cap")
    assert(seqOf("n_buckets_dropped") ===
      seqOf("n_buckets_dropped").sorted.reverse,
      "dropped buckets are non-increasing in the cap")
    assert(seqOf("pair_work_saved_ppm") ===
      seqOf("pair_work_saved_ppm").sorted.reverse,
      "work saved is non-increasing in the cap")
    assert(seqOf("n_candidates").distinct.length === 1 &&
      seqOf("n_true_dups").distinct.length === 1,
      "candidate and truth columns must not depend on the cap")
    val top = rows.last // cap 8 >= every bucket in this fixture
    assert(top.getAs[Long]("n_buckets_dropped") === 0L)
    assert(top.getAs[Long]("pair_work_saved_ppm") === 0L)
    assert(top.getAs[Long]("n_kept") === top.getAs[Long]("n_candidates"))
    assert(top.getAs[Long]("recall_ppm") === 1000000L)
    val bottom = rows.head // cap 1: every multi-row bucket drops
    assert(bottom.getAs[Long]("n_kept") === 0L)
    assert(bottom.getAs[Long]("pair_work_saved_ppm") === 1000000L)
    assert(bottom.getAs[Long]("n_true_dups") > 0L,
      "the fixture must contain true dups for the recall column to price")
  }

  test("a vacuous cell (zero true dups) reads full recall, not zero") {
    // a threshold above 10^6 makes every cell's truth set empty;
    // recall must read 1000000 so a curve scan can tell "nothing to
    // lose" from "lost everything" (ADVICE r17)
    val rows = MinHashLSH.capSweep(corpus, "doc_id", "text", ShingleN,
      NumHashes, 1, caps, 1000001L).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Long]("n_true_dups") === 0L)
      assert(r.getAs[Long]("recall_ppm") === 1000000L)
    }
  }

  test("degenerate grids are rejected loudly") {
    intercept[IllegalArgumentException] {
      MinHashLSH.capSweep(corpus, "doc_id", "text", ShingleN, NumHashes,
        1, Seq.empty, 500000L)
    }
    intercept[IllegalArgumentException] {
      MinHashLSH.capSweep(corpus, "doc_id", "text", ShingleN, NumHashes,
        1, Seq(0L), 500000L)
    }
  }
}
