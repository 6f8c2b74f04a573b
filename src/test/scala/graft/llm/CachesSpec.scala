package graft.llm

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Eviction semantics of the bounded cache tracker: dedup by canonical
  * plan, oldest-first eviction past MaxTracked, and the recompute
  * contract (unpersisting a frame a lazy consumer still references is
  * safe — Spark recomputes from lineage). */
class CachesSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  test("plan-identical persists share one tracked entry") {
    Caches.unpersistAll(blocking = true)
    val base = Seq((1L, "x"), (2L, "y")).toDF("id", "t")
    val p1 = Caches.persistTracked(base.select(col("id")))
    val p2 = Caches.persistTracked(base.select(col("id")))
    assert(p1.storageLevel == StorageLevel.MEMORY_AND_DISK)
    assert(p2.storageLevel == StorageLevel.MEMORY_AND_DISK)
    // the second call deduped against the first's canonical plan: ONE
    // tracked entry releases everything
    assert(Caches.unpersistAll(blocking = true) == 1)
  }

  test("eviction past MaxTracked unpersists oldest-first; dependents recompute") {
    Caches.unpersistAll(blocking = true)
    val first = Caches.persistTracked(Seq((1L, 2L), (3L, 4L)).toDF("a", "b"))
    // a query that consumes the soon-to-be-evicted frame, planned (but
    // not executed) while the cache is live
    val dependent = first.agg(sum(col("a") + col("b")).as("s"))
    assert(first.storageLevel == StorageLevel.MEMORY_AND_DISK)
    // fill past the cap with MaxTracked further distinct plans — the
    // oldest (first) must be the one evicted
    val extras = (1 to Caches.MaxTracked).map { i =>
      Caches.persistTracked(Seq((i.toLong, -i.toLong)).toDF("a", "b"))
    }
    assert(first.storageLevel == StorageLevel.NONE, "oldest entry must be evicted")
    assert(extras.forall(_.storageLevel == StorageLevel.MEMORY_AND_DISK),
      "newer entries must survive the eviction")
    // unpersist mid-query is safe: the dependent recomputes from lineage
    assert(dependent.head().getLong(0) == 10L)
    assert(Caches.unpersistAll(blocking = true) == Caches.MaxTracked)
  }

  test("unpersistAll(blocking) releases every tracked entry and reports the count") {
    Caches.unpersistAll(blocking = true)
    val a = Caches.persistTracked(Seq(1L, 2L).toDF("x"))
    val b = Caches.persistTracked(Seq(3L).toDF("x"))
    assert(Caches.unpersistAll(blocking = true) == 2)
    assert(a.storageLevel == StorageLevel.NONE)
    assert(b.storageLevel == StorageLevel.NONE)
    // idempotent: nothing left to release
    assert(Caches.unpersistAll(blocking = true) == 0)
  }
}
