package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Fixed-point BM25: integer-exact idf, saturation shape, ranking
  * invariants, and the null/blank-text contract. */
class Bm25Spec extends AnyFunSuite with SparkTestSession {

  private def docsDF = {
    import spark.implicits._
    Seq(
      (1L, "rust rust rust common common"),  // tf(rust)=3, short
      (2L, "rust common common common common common common common"),
      (3L, "common common common common common"),
      (4L, "other words entirely"),
      (5L, ""),                               // blank: dl=0, no terms
      (6L, null.asInstanceOf[String]),        // null text
    ).toDF("doc_id", "text")
  }

  test("idfQ4 is floor(4*log2(n/df)), exactly") {
    assert(Bm25.idfQ4(500, 500) === 0L)
    assert(Bm25.idfQ4(500, 25) === 17L)  // 4*log2(20) = 17.28...
    assert(Bm25.idfQ4(500, 394) === 1L)  // 4*log2(1.269) = 1.37...
    // brute check against double math away from floor boundaries
    for (n <- Seq(10L, 100L, 1000L, 1000000L); df <- 1L to math.min(n, 50L)) {
      val exact = Bm25.idfQ4(n, df)
      val float = math.floor(4.0 * math.log(n.toDouble / df) / math.log(2.0))
      assert(math.abs(exact - float) <= 1,
        s"n=$n df=$df exact=$exact float=$float")
    }
  }

  test("idfQ4 is monotone: rarer terms never weigh less") {
    val ws = (1L to 100L).map(Bm25.idfQ4(100L, _))
    assert(ws === ws.sorted.reverse)
    assert(ws.last === 0L)
  }

  test("rare term outranks common term; tf raises score within a term") {
    val top = Bm25.scoreTopK(docsDF, "doc_id", "text",
      Seq("q" -> Seq("rust", "common")), k = 10).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getInt(3)))
    val byDoc = top.map { case (d, s, _) => d -> s }.toMap
    // docs 1,2 contain the rare term; 3 only the ubiquitous one
    assert(byDoc(1L) > byDoc(3L) && byDoc(2L) > byDoc(3L))
    // doc 1 has tf(rust)=3 and is shorter than doc 2 (tf=1): saturation
    // and the length norm both favor it
    assert(byDoc(1L) > byDoc(2L))
    // doc 4 and the blank/null docs match no term → absent
    assert(!byDoc.contains(4L) && !byDoc.contains(5L) && !byDoc.contains(6L))
    // ranks are 1..n in score order
    assert(top.sortBy(_._3).map(_._2).toSeq ===
      top.map(_._2).sorted(Ordering[Long].reverse).toSeq)
  }

  test("duplicate query terms count once; labels map back correctly") {
    val once = Bm25.scoreTopK(docsDF, "doc_id", "text",
      Seq("a" -> Seq("rust")), k = 10).collect()
    val twice = Bm25.scoreTopK(docsDF, "doc_id", "text",
      Seq("a" -> Seq("rust", "rust")), k = 10).collect()
    assert(once.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet ===
      twice.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet)
  }

  test("k truncates per query, ties break by doc_id ascending") {
    import spark.implicits._
    // four identical docs → identical scores; only doc_id orders them
    val clones = (1L to 4L).map(i => (i, "tie tie tie")).toDF("doc_id", "text")
    val r = Bm25.scoreTopK(clones, "doc_id", "text",
      Seq("q" -> Seq("tie")), k = 2).collect()
      .map(r => (r.getLong(1), r.getInt(3))).sortBy(_._2)
    assert(r.toSeq === Seq((1L, 1), (2L, 2)))
  }

  test("terms absent from the corpus contribute nothing and do not fail") {
    val r = Bm25.scoreTopK(docsDF, "doc_id", "text",
      Seq("q" -> Seq("zzz_missing", "rust")), k = 10).collect()
    assert(r.nonEmpty && r.forall(_.getLong(2) > 0L))
  }

  test("scores are partition-invariant (sum of longs, two-level top-k)") {
    val a = Bm25.scoreTopK(docsDF.repartition(1), "doc_id", "text",
      Seq("q" -> Seq("rust", "common")), k = 10).collect().toSet
    val b = Bm25.scoreTopK(docsDF.repartition(7), "doc_id", "text",
      Seq("q" -> Seq("rust", "common")), k = 10).collect().toSet
    assert(a === b)
  }

  test("the term filter reaches the token stream before the tf shuffle") {
    val tfPlan = Bm25.scoreTopK(docsDF, "doc_id", "text",
      Seq("q" -> Seq("rust")), k = 3)
      .queryExecution.executedPlan.toString
    // tree print order is parent-first, so the scan-side shape
    // partial-agg → term filter → explode must read top-down: the
    // term filter sits BETWEEN them — tokens of non-query terms die
    // in the scan stage, before the (doc_id, w) exchange sees a row
    val genIdx = tfPlan.indexOf("Generate explode")
    val filterIdx = tfPlan.indexOf("Filter", tfPlan.indexOf("partial_count"))
    assert(genIdx >= 0 && filterIdx >= 0 && filterIdx < genIdx,
      s"expected partial-agg → term filter → explode:\n$tfPlan")
    assert(tfPlan.substring(filterIdx, genIdx).contains("rust"),
      s"the filter above the explode must be the term filter:\n$tfPlan")
  }
}
