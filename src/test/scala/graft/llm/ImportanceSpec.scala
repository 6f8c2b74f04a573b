package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[Importance]]: the rational DSIR arithmetic verified against an
  * independent BigInt model, the selection-pressure property, and the
  * null/blank text contract. (The md5-mod-P base hash itself is pinned
  * by ShingleBasesProps; here buckets are treated as opaque ids.)
  */
class ImportanceSpec extends AnyFunSuite with SparkTestSession {

  private val B = 4096

  private def df(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("weights and scores match an independent BigInt model") {
    val target = df((1L, "a a b"), (2L, "b c"))
    val raw = df((1L, "a a b"), (2L, "b c"), (3L, "d d d a"))
    val tc = Importance.bucketCounts(target, "doc_id", "text", B)
    val rc = Importance.bucketCounts(raw, "doc_id", "text", B)
    // independent model over the SAME opaque bucket ids
    val tCnt = tc.collect().map(r => (r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val rCnt = rc.collect().map(r => (r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val (tT, rT) = (tCnt.values.sum, rCnt.values.sum)
    assert(tT === 5L && rT === 9L)
    def wModel(b: Long): Long =
      (BigInt(1000000) * BigInt(tCnt.getOrElse(b, 0L) + 1) * BigInt(rT + B) /
        (BigInt(rCnt(b) + 1) * BigInt(tT + B))).toLong
    val got = Importance.bucketWeights(tc, rc, B).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.keySet === rCnt.keySet)
    got.foreach { case (b, w) => assert(w === wModel(b), s"bucket $b") }
    // doc score = count-weighted mean of its buckets' weights
    val perDoc = rc.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val scores = Importance.docScores(rc, Importance.bucketWeights(tc, rc, B))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    Seq(1L, 2L, 3L).foreach { d =>
      val rows = perDoc.filter(_._1 == d)
      val n = rows.map(_._3).sum
      val s = (rows.map(r => BigInt(r._3) * BigInt(wModel(r._2))).sum /
        BigInt(n)).toLong
      assert(scores(d) === ((n, s)), s"doc $d")
    }
    // "d" never appears in the target: doc 3 (mostly d) must score
    // below doc 1 (pure target vocab)
    assert(scores(3L)._2 < scores(1L)._2)
  }

  test("selection pressure: target-vocab docs outscore junk-vocab docs") {
    val targetish = (0L until 20L).map(i =>
      (i, s"alpha beta gamma w${i % 3}"))
    val junk = (100L until 120L).map(i =>
      (i, s"zz${i} qq${i * 7} vv${i * 13}"))
    val raw = df((targetish ++ junk): _*)
    val counts = Importance.bucketCounts(raw, "doc_id", "text", B)
    val tCounts = counts.filter(col("doc_id") < 20L)
    val scores = Importance.docScores(counts,
        Importance.bucketWeights(tCounts, counts, B))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val worstTarget = (0L until 20L).map(scores).min
    val bestJunk = (100L until 120L).map(scores).max
    assert(worstTarget > bestJunk,
      s"target floor $worstTarget must beat junk ceiling $bestJunk")
  }

  test("null text drops out; blank text scores with the '' shingle") {
    val raw = df((1L, "x y"), (2L, null), (3L, "  "))
    val counts = Importance.bucketCounts(raw, "doc_id", "text", B)
    val scored = Importance.docScores(counts,
        Importance.bucketWeights(counts, counts, B))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(!scored.contains(2L), "null text must not score")
    assert(scored(3L) === 1L, "blank doc carries the single '' shingle")
    assert(scored(1L) === 2L)
  }
  test("lifecycle folds: weights from folded counts equal the rebuild's") {
    val old = df((1L, "alpha beta alpha"), (2L, "gamma delta"))
    val arr = df((10L, "alpha epsilon"))
    val raw = df((1L, "alpha beta alpha"), (2L, "gamma delta"),
      (10L, "alpha epsilon"), (20L, "junk junk junk junk"))
    val rawCounts = Importance.bucketCounts(raw, "doc_id", "text", B)
    def weightsOf(target: org.apache.spark.sql.DataFrame) =
      Importance.bucketWeights(target, rawCounts, B)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // append: fold the arrival into the shipped target counts
    val folded = Importance.countsDelta(
      Importance.bucketCounts(old, "doc_id", "text", B), arr,
      "doc_id", "text", B)
    assert(weightsOf(folded) === weightsOf(
      Importance.bucketCounts(old.unionByName(arr), "doc_id", "text", B)),
      "delta-folded weights must equal the rebuild's")
    // erase: forget doc 2 from the folded state
    val erased = Importance.countsErase(folded,
      df((2L, "")).select(org.apache.spark.sql.functions.col("doc_id")))
    assert(weightsOf(erased) === weightsOf(Importance.bucketCounts(
        old.filter(org.apache.spark.sql.functions.col("doc_id") =!= 2L)
          .unionByName(arr), "doc_id", "text", B)),
      "erase-folded weights must equal the rebuild-without's")
  }
}
