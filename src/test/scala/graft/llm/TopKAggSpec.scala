package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The bounded top-k aggregator: equal to the sort-take reference,
  * merge-order-independent, and its physical plan is an aggregate
  * (map-side partial state), NOT a window over corpus rows. */
class TopKAggSpec extends AnyFunSuite with SparkTestSession {

  private val K = 3
  private def ref(rows: Seq[(Long, Long)]): Seq[(Long, Long)] =
    rows.sortBy { case (s, id) => (-s, id) }.take(K)

  test("reduce/merge equal the sort-take reference on random data") {
    val rnd = new scala.util.Random()
    val agg = new TopKAgg(K)
    (1 to 200).foreach { _ =>
      val rows = Seq.fill(rnd.nextInt(40))(
        (rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong)).distinct
      val reduced = rows.foldLeft(agg.zero)(agg.reduce)
      assert(reduced === ref(rows))
      // any split point merges back to the same answer (commutated too)
      val cut = if (rows.isEmpty) 0 else rnd.nextInt(rows.size + 1)
      val (a, b) = rows.splitAt(cut)
      val (ba, bb) =
        (a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
      assert(agg.merge(ba, bb) === ref(rows))
      assert(agg.merge(bb, ba) === ref(rows))
    }
  }

  test("end-to-end through udaf: grouped top-k, deterministic ties, plan is an aggregate") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val topk = udaf(new TopKAgg(2))
    // group g1 has a tie at score 9 — ids 4 and 2 — id asc must win
    val df = Seq(("g1", 9L, 4L), ("g1", 9L, 2L), ("g1", 7L, 9L),
      ("g1", 1L, 1L), ("g2", 5L, 5L)).toDF("g", "s", "id")
      .groupBy($"g").agg(topk($"s", $"id").as("top"))
    val got = df.collect().map(r =>
      r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(e => (e.getLong(0), e.getLong(1)))).toMap
    assert(got("g1") === Seq((9L, 2L), (9L, 4L)))
    assert(got("g2") === Seq((5L, 5L)))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"top-k must run as an AGGREGATE, got:\n$plan")
    assert(!plan.contains("Window"), "top-k must not fall back to a window")
  }
}
