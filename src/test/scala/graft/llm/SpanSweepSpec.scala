package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[Dedup.spanSweep]] (q310's aggressiveness card): every grid cell
  * must price EXACTLY what [[Dedup.removeDupSpans]] removes at that
  * (gramN, minOcc) — same blocklist, same interval-union coverage —
  * so the card's numbers are the strip's numbers, not an estimate. */
class SpanSweepSpec extends AnyFunSuite with SparkTestSession {

  private def df(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val corpus = df(
    (1L, "one two three boiler plate text end"),
    (2L, "four five six boiler plate text tail"),
    (3L, "seven eight nine ten boiler plate"),
    (4L, "alpha beta gamma delta"),
    (5L, "one two three one two three one two"))

  private val gramNs = Seq(2, 3)
  private val minOccs = Seq(2L, 3L, 5L)

  test("each cell equals the actual strip at that operating point") {
    val sweep = Dedup.spanSweep(corpus, "doc_id", "text", gramNs, minOccs)
      .collect().map(r => ((r.getAs[Long]("gram_n"),
        r.getAs[Long]("min_occ")),
        (r.getAs[Long]("n_blocklist_grams"),
          r.getAs[Long]("n_docs_touched"),
          r.getAs[Long]("tokens_removed"),
          r.getAs[Long]("total_tokens"),
          r.getAs[Long]("strip_ppm")))).toMap
    assert(sweep.size === gramNs.size * minOccs.size,
      "one row per grid cell")
    val total = corpus.agg(sum(TextAnalysis.tokenCount(col("text"))
      .cast("bigint"))).collect().head.getLong(0)
    for (n <- gramNs; m <- minOccs) {
      val bl = Dedup.dupGramIndex(corpus, "doc_id", "text", n, m)
      val nBl = bl.count()
      val stripped = Dedup.stripSpans(corpus, "doc_id", "text", n, bl)
        .select(col("doc_id"), col("n_removed")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val removed = stripped.values.sum
      val touched = stripped.values.count(_ > 0L).toLong
      val expect = (nBl, touched, removed, total,
        removed * 1000000L / math.max(total, 1L))
      assert(sweep((n.toLong, m)) === expect,
        s"cell (gramN=$n, minOcc=$m) must match the strip")
    }
  }

  test("a threshold above every gram count reads a zero row, not no row") {
    val sweep = Dedup.spanSweep(corpus, "doc_id", "text", Seq(3),
      Seq(100L)).collect()
    assert(sweep.length === 1)
    val r = sweep.head
    assert(r.getAs[Long]("n_blocklist_grams") === 0L)
    assert(r.getAs[Long]("n_docs_touched") === 0L)
    assert(r.getAs[Long]("tokens_removed") === 0L)
    assert(r.getAs[Long]("strip_ppm") === 0L)
    assert(r.getAs[Long]("total_tokens") > 0L,
      "the denominator still reports the corpus")
  }

  test("aggressiveness is monotone: removal never grows with minOcc") {
    val bySweep = Dedup.spanSweep(corpus, "doc_id", "text", Seq(2),
        Seq(2L, 3L, 4L, 5L)).collect()
      .sortBy(_.getAs[Long]("min_occ"))
      .map(_.getAs[Long]("tokens_removed")).toSeq
    assert(bySweep === bySweep.sorted.reverse,
      "tokens_removed must be non-increasing in minOcc")
  }

  test("empty and degenerate grids are rejected loudly") {
    intercept[IllegalArgumentException] {
      Dedup.spanSweep(corpus, "doc_id", "text", Seq.empty, Seq(2L))
    }
    intercept[IllegalArgumentException] {
      Dedup.spanSweep(corpus, "doc_id", "text", Seq(2), Seq(1L))
    }
  }
}
