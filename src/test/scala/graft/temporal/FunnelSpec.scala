package graft.temporal

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** Planted-fixture semantics for the ordered funnel: each stage
  * counts only STRICTLY after the user's previous-stage first reach;
  * out-of-order events never advance; every user with ≥1 event
  * appears.
  */
class FunnelSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private val stages = Seq("view" -> "view", "click" -> "click",
    "purchase" -> "purchase")

  test("ordering enforced: pre-frontier events don't advance a stage") {
    val ev = Seq(
      // user 1: click@5 precedes first view → ignored; purchase@15
      // precedes the click frontier (20) → ignored; completes at 30
      (1L, "click", 5L), (1L, "view", 10L), (1L, "click", 20L),
      (1L, "purchase", 15L), (1L, "purchase", 30L),
      // user 2: click AT view time (10) is not strictly after → the
      // later click@12 is the frontier; no purchase
      (2L, "click", 5L), (2L, "view", 10L), (2L, "click", 10L),
      (2L, "click", 12L),
      // user 3: purchase only → stage 0 but still present
      (3L, "purchase", 1L),
      // user 4: click exactly at the view frontier, never after
      (4L, "view", 10L), (4L, "click", 10L)
    ).toDF("user_id", "event_type", "us")
    val out = Funnel.reach(ev, "user_id", "event_type", "us", stages)
      .select("user", "view_us", "click_us", "purchase_us", "stage")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L))
    assert(out(1L).getLong(1) === 10L && out(1L).getLong(2) === 20L &&
      out(1L).getLong(3) === 30L && out(1L).getLong(4) === 3L)
    assert(out(2L).getLong(2) === 12L && out(2L).isNullAt(3) &&
      out(2L).getLong(4) === 2L)
    assert(out(3L).isNullAt(1) && out(3L).getLong(4) === 0L)
    assert(out(4L).getLong(1) === 10L && out(4L).isNullAt(2) &&
      out(4L).getLong(4) === 1L)
  }

  test("stage counts are monotone: reached(k) ⊆ reached(k−1)") {
    val rnd = new scala.util.Random(41)
    val types = Array("view", "click", "purchase", "error")
    val ev = (0 until 600).map { i =>
      (rnd.nextInt(40).toLong, types(rnd.nextInt(4)), rnd.nextInt(1000).toLong)
    }.toDF("user_id", "event_type", "us")
    val out = Funnel.reach(ev, "user_id", "event_type", "us", stages).collect()
    out.foreach { r =>
      val reach = Seq("view_us", "click_us", "purchase_us")
        .map(c => !r.isNullAt(r.fieldIndex(c)))
      // a null stage never precedes a non-null one
      assert(reach === reach.sortBy(!_))
      assert(r.getLong(r.fieldIndex("stage")) === reach.count(identity))
    }
  }
}
