package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Lifecycle folds of the dup-gram blocklist artifact (q300/q301's
  * shipped state): counts are a commutative monoid, so append
  * ([[Dedup.dupGramDelta]]) and erase ([[Dedup.dupGramErase]]) must
  * both land exactly on the rebuild — including grams crossing the
  * blocklist threshold in either direction, which the `n >= minOcc`
  * VIEW ([[Dedup.blocklistOf]]) handles with no special casing. */
class DupGramLifecycleSpec extends AnyFunSuite with SparkTestSession {

  private val N = 3

  private def df(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def counts(d: DataFrame) =
    Dedup.dupGramCounts(d, "doc_id", "text", N)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def asSet(d: DataFrame) =
    d.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("delta fold == rebuild; a gram crossing minOcc enters the blocklist") {
    val old = df((1L, "alpha beta gamma delta"), (2L, "epsilon zeta eta"))
    val arr = df((10L, "alpha beta gamma omega")) // repeats 'alpha beta gamma'
    val folded = Dedup.dupGramDelta(
      Dedup.dupGramCounts(old, "doc_id", "text", N), arr, "doc_id",
      "text", N)
    assert(asSet(folded) === counts(old.unionByName(arr)),
      "delta must equal the rebuild counts")
    val bl = Dedup.blocklistOf(folded, 2L)
      .collect().map(_.getLong(0)).toSet
    // exactly the repeated gram crosses the threshold
    assert(bl.size === 1, s"one gram must cross minOcc, got ${bl.size}")
  }

  test("erase fold == rebuild; a gram falling under minOcc leaves the blocklist") {
    val corpus = df(
      (1L, "alpha beta gamma delta"), (2L, "alpha beta gamma omega"),
      (3L, "epsilon zeta eta theta"))
    val all = Dedup.dupGramCounts(corpus, "doc_id", "text", N)
    assert(Dedup.blocklistOf(all, 2L).count() === 1L)
    val folded = Dedup.dupGramErase(all,
      corpus.filter(col("doc_id") === 2L), "doc_id", "text", N)
    assert(asSet(folded) === counts(corpus.filter(col("doc_id") =!= 2L)),
      "erase must equal the rebuild counts; zero-count grams delete")
    assert(Dedup.blocklistOf(folded, 2L).count() === 0L,
      "the gram must fall back out of the blocklist")
  }

  test("strip through the maintained view equals strip through a rebuild") {
    val corpus = df(
      (1L, "one two three boiler plate text end"),
      (2L, "four five six boiler plate text tail"),
      (3L, "seven eight nine ten"))
    val arr = df((10L, "fresh start boiler plate text and more"))
    val maintained = Dedup.blocklistOf(
      Dedup.dupGramDelta(Dedup.dupGramCounts(corpus, "doc_id", "text", N),
        arr, "doc_id", "text", N), 2L)
    val rebuilt = Dedup.dupGramIndex(corpus.unionByName(arr), "doc_id",
      "text", N, 2L)
    def strip(bl: DataFrame) =
      Dedup.stripSpans(arr, "doc_id", "text", N, bl)
        .collect().map(_.toSeq).toSeq
    assert(strip(maintained) === strip(rebuilt),
      "serving from the folded artifact must equal the rebuild")
  }
}
