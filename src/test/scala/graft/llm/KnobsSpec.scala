package graft.llm

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The knob-frontier gate (r17 verdict ask #5): every production
  * operating point in [[Knobs]] must sit on its tuning card's
  * MEASURED frontier at sf0.001 — the REAL cards run here (through
  * SparkEntry, grids included), so editing a knob without re-running
  * its card fails the build. Assertions are relative/threshold
  * conditions (full recall, majority savings, strip ceiling), not
  * absolute corpus pins, so a regenerated corpus re-measures rather
  * than hash-fails. */
class KnobsSpec extends AnyFunSuite with SparkTestSession {

  private val Dir = "/root/testdata/sf0.001"

  private def rows(q: String): Array[Row] = {
    Caches.unpersistAll(blocking = true)
    graft.SparkEntry.queries(q)(spark, Dir).collect()
  }

  test("the production bucket cap holds FULL recall on the q314 " +
      "curve while saving real pair work") {
    val r = rows("q314_cap_sweep")
      .find(_.getAs[Long]("cap") == Knobs.NearDupBucketCap.toLong)
      .getOrElse(fail("cap grid lost the production point"))
    assert(r.getAs[Long]("recall_ppm") === 1000000L,
      "the skew guard must not cost recall at the production cap")
    assert(r.getAs[Long]("pair_work_saved_ppm") > 0L,
      "a cap that saves nothing is not a guard")
    assert(r.getAs[Long]("n_true_dups") > 0L,
      "the frontier claim needs a non-vacuous truth set")
  }

  test("the production 1-bit screen holds FULL recall on the q311 " +
      "curve while skipping the majority of cold verifies") {
    val r = rows("q311_bbit_screen_sweep")
      .find(_.getAs[Long]("screen_min_ppm") == Knobs.BbitScreenPpm)
      .getOrElse(fail("screen grid lost the production point"))
    assert(r.getAs[Long]("recall_ppm") === 1000000L,
      "the hot-tier screen must not cost recall at the production " +
        "threshold")
    assert(r.getAs[Long]("verify_saved_ppm") >= 500000L,
      "the screen exists to save cold-artifact reads (measured " +
        "787644 ppm at sf0.001)")
    assert(r.getAs[Long]("n_true_dups") > 0L)
  }

  test("the production span point is non-vacuous, cheaper than the " +
      "short-gram column, and under the 15% strip ceiling on q310") {
    val all = rows("q310_span_sweep")
    def cell(g: Long, m: Long): Row = all
      .find(r => r.getAs[Long]("gram_n") == g &&
        r.getAs[Long]("min_occ") == m)
      .getOrElse(fail(s"span grid lost cell ($g, $m)"))
    val prod = cell(Knobs.SpanGramN.toLong, Knobs.SpanMinOcc)
    assert(prod.getAs[Long]("tokens_removed") > 0L,
      "the production cell must be a real measurement, not vacuous")
    val short = cell(4L, Knobs.SpanMinOcc)
    assert(prod.getAs[Long]("strip_ppm") < short.getAs[Long]("strip_ppm"),
      "longer grams must strip less than gramN=4 at the same minOcc")
    assert(prod.getAs[Long]("strip_ppm") <= 150000L,
      "the strip must stay under the documented 15% corpus ceiling")
  }
}
