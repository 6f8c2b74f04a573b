package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The positional index's lifecycle folds stay rebuild-exact — the
  * structural guarantee (row-per-(term, doc)) pinned so a future
  * change to `build` (df caps, list truncation) cannot silently turn
  * the folds approximate. */
class PostingsLifecycleSpec extends AnyFunSuite with SparkTestSession {

  private def df(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def rows(d: DataFrame) = d.collect()
    .map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2))).toSet

  test("delta and erase both equal the rebuild; a re-crawl is erase-then-fold") {
    val old = df((1L, "alpha beta alpha"), (2L, "beta gamma"),
      (3L, "delta epsilon"))
    val arr = df((10L, "alpha gamma gamma"), (11L, ""))
    val built = Postings.build(old, "doc_id", "text")
    assert(rows(Postings.delta(built, arr, "doc_id", "text"))
      === rows(Postings.build(old.unionByName(arr), "doc_id", "text")))
    assert(rows(Postings.erase(built, df((2L, ""), (999L, ""))
        .select(col("doc_id"))))
      === rows(Postings.build(old.filter(col("doc_id") =!= 2L),
        "doc_id", "text")))
    // re-crawl doc 1 with changed text
    val recrawl = df((1L, "zeta eta"))
    val folded = Postings.delta(
      Postings.erase(built, recrawl.select(col("doc_id"))),
      recrawl, "doc_id", "text")
    assert(rows(folded) === rows(Postings.build(
      old.filter(col("doc_id") =!= 1L).unionByName(recrawl),
      "doc_id", "text")))
  }
}
