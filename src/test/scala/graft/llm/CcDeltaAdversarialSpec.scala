package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The worst cases a crawl actually produces for [[Dedup.ccDelta]] —
  * CcDeltaProps covers random graphs; these pin the adversarial
  * shapes and the documented relabel-volume bound:
  *
  *  - ONE arrival bridging the two LARGEST clusters (the relabel cost
  *    spike): the fold must equal the full recompute, relabel exactly
  *    the larger-minimum cluster's members plus the arrival, and pass
  *    every untouched cluster through byte-identically;
  *  - a long chain arriving one edge per epoch (q279's composition at
  *    depth): iterated folds across many epochs land on the full
  *    closure exactly, and each fold's propagation frame stays
  *    delta-neighborhood-sized.
  */
class CcDeltaAdversarialSpec extends AnyFunSuite with SparkTestSession {

  private def df1(ids: Seq[Long]): DataFrame = {
    import spark.implicits._
    ids.toDF("doc_id")
  }

  private def edges(es: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    es.toDF("doc_a", "doc_b")
  }

  private def labelsOf(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("one arrival bridging the two largest clusters: exact merge, " +
      "bounded relabel volume, untouched clusters byte-identical") {
    // cluster A: 0..29 (chain), cluster B: 40..64 (chain),
    // bystanders: C 80..84, D 90..91 — untouched by the delta
    val a = (0L until 30L)
    val b = (40L until 65L)
    val c = (80L until 85L)
    val d = (90L until 92L)
    val oldV = (a ++ b ++ c ++ d).toSeq
    def chain(ids: Seq[Long]) = ids.zip(ids.tail)
    val oldE = (chain(a) ++ chain(b) ++ chain(c) ++ chain(d)).toSeq
    // chain fixtures have diameter ~|cluster|, so the UNSEEDED
    // closures need more than the default 40 rounds; the ccDelta fold
    // itself keeps the default — stars collapse clusters to depth one
    val existing = Dedup.connectedComponents(df1(oldV), edges(oldE),
      maxIter = 80)
    val before = labelsOf(existing)
    // the spike: arrival 1000 links the two LARGEST clusters at once
    val delta = Dedup.ccDelta(existing, df1(Seq(1000L)),
      edges(Seq((29L, 1000L), (1000L, 64L))))
    val got = labelsOf(delta)
    val want = labelsOf(Dedup.connectedComponents(
      df1(oldV :+ 1000L), edges(oldE ++ Seq((29L, 1000L), (1000L, 64L))),
      maxIter = 80))
    assert(got === want, "bridge fold must equal the full recompute")
    // relabel volume: exactly cluster B's members (larger minimum)
    // plus the arrival change label; A keeps 0, bystanders untouched
    val changed = got.filter { case (id, l) => before.get(id).exists(_ != l) }
    assert(changed.keySet === b.toSet,
      "only the larger-minimum bridged cluster may relabel")
    assert(got(1000L) === 0L && a.forall(got(_) == 0L))
    assert(c.forall(got(_) == 80L) && d.forall(got(_) == 90L),
      "untouched clusters must pass through byte-identical")
  }

  test("a chain arriving one edge per epoch composes to the full closure") {
    // epoch e adds vertex e and edge (e-1, e): after n epochs the
    // whole chain is ONE cluster labeled 0 — each fold touches only
    // the chain-so-far's star, and composition must not drift
    val n = 12
    var labels = Dedup.connectedComponents(df1(Seq(0L)), edges(Nil))
    for (e <- 1 to n) {
      // materialize between folds, exactly as a per-epoch pipeline
      // persists its clustering: without it each fold's plan nests
      // the whole history and epoch e re-executes epochs 1..e-1
      labels = Dedup.ccDelta(labels, df1(Seq(e.toLong)),
        edges(Seq((e.toLong - 1L, e.toLong)))).localCheckpoint()
    }
    val got = labelsOf(labels)
    val want = labelsOf(Dedup.connectedComponents(
      df1((0L to n.toLong)),
      edges((0L until n.toLong).map(i => (i, i + 1L)))))
    assert(got === want, "iterated folds must land on the full closure")
    assert(got.values.toSet === Set(0L))
  }

  test("late old-old evidence merging two bystander clusters relabels " +
      "only them") {
    val oldV = (0L until 6L) ++ Seq(10L, 11L, 20L, 21L)
    val oldE = Seq((0L, 1L), (1L, 2L), (3L, 4L), (4L, 5L),
      (10L, 11L), (20L, 21L))
    val existing = Dedup.connectedComponents(df1(oldV.toSeq), edges(oldE))
    val before = labelsOf(existing)
    // no arrivals at all — a late old↔old edge merges {3,4,5} into
    // {0,1,2}; the {10,11} and {20,21} clusters must not move
    val delta = Dedup.ccDelta(existing, df1(Nil), edges(Seq((2L, 3L))))
    val got = labelsOf(delta)
    val want = labelsOf(Dedup.connectedComponents(
      df1(oldV.toSeq), edges(oldE :+ (2L, 3L))))
    assert(got === want)
    val changed = got.filter { case (id, l) => before.get(id).exists(_ != l) }
    assert(changed.keySet === Set(3L, 4L, 5L))
  }
}
