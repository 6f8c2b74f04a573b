package graft.sync

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Snapshot diff: verdict classification, null-safe comparison,
  * compare-column pinning, and schema-drift tolerance. */
class SnapshotDiffSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def collectMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("all four verdicts; null-safe equality on data columns") {
    val old = Seq(
      (1L, Some("a")), (2L, Some("b")), (3L, Some("c")),
      (4L, None: Option[String]), (5L, None: Option[String]))
      .toDF("k", "v")
    val neu = Seq(
      (1L, Some("a")),                   // unchanged
      (2L, Some("B")),                   // update
      // 3 absent → delete
      (4L, None: Option[String]),        // null == null → unchanged
      (5L, Some("x")),                   // null → value → update
      (6L, Some("new")))                 // insert
      .toDF("k", "v")
    val got = collectMap(SnapshotDiff.diff(old, neu, Seq("k")))
    assert(got === Map(1L -> "unchanged", 2L -> "update", 3L -> "delete",
      4L -> "unchanged", 5L -> "update", 6L -> "insert"))
  }

  test("compareCols pins the comparison; drifted extra columns ignored") {
    val old = Seq((1L, "a", 10), (2L, "b", 20)).toDF("k", "v", "w")
    val neu = Seq((1L, "a", 99, "extra"), (2L, "B", 20, "extra"))
      .toDF("k", "v", "w", "only_new")
    // default: shared non-key columns (v, w) → both rows differ
    val full = collectMap(SnapshotDiff.diff(old, neu, Seq("k")))
    assert(full === Map(1L -> "update", 2L -> "update"))
    // pinned to v: row 1's w drift is invisible
    val pinned = collectMap(SnapshotDiff.diff(old, neu, Seq("k"), Seq("v")))
    assert(pinned === Map(1L -> "unchanged", 2L -> "update"))
  }

  test("scd2: close/keep/open arms; history passes through untouched") {
    val dim = Seq(
      (1L, "a", 0L, Some(50L)),  // already-closed history
      (1L, "a2", 50L, None),     // current, will update
      (2L, "b", 0L, None),       // current, unchanged
      (3L, "c", 0L, None))       // current, will delete
      .toDF("k", "v", "valid_from", "valid_to")
    val snap = Seq((1L, "a3"), (2L, "b"), (4L, "d")).toDF("k", "v")
    val got = Scd2.applySnapshot(dim, snap, Seq("k"), batchTs = 100L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    assert(got === Set(
      (1L, "a", 0L, Some(50L)),    // history untouched
      (1L, "a2", 50L, Some(100L)), // closed by the update
      (1L, "a3", 100L, None),      // opened by the update
      (2L, "b", 0L, None),         // kept
      (3L, "c", 0L, Some(100L)),   // closed by the delete
      (4L, "d", 100L, None)))      // opened by the insert
  }

  test("scd2: applying the identical snapshot is a no-op") {
    val dim = Seq((1L, "a", 0L, None: Option[Long]), (2L, "b", 0L, None: Option[Long]))
      .toDF("k", "v", "valid_from", "valid_to")
    val snap = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val got = Scd2.applySnapshot(dim, snap, Seq("k"), 100L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.isNullAt(3))).toSet
    assert(got === Set((1L, "a", 0L, true), (2L, "b", 0L, true)))
  }

  test("empty key set refused; key-only frames classify by presence") {
    intercept[IllegalArgumentException] {
      SnapshotDiff.diff(Seq((1L, "x")).toDF("k", "v"),
        Seq((1L, "x")).toDF("k", "v"), Nil)
    }
    val got = collectMap(SnapshotDiff.diff(
      Seq(Tuple1(1L), Tuple1(2L)).toDF("k"),
      Seq(Tuple1(2L), Tuple1(3L)).toDF("k"), Seq("k")))
    assert(got === Map(1L -> "delete", 2L -> "unchanged", 3L -> "insert"))
  }
}
