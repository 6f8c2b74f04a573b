package graft.governance

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** Column profiling: exact card on a hand-built frame covering every
  * rendering arm (integral, float fixed-point, string, timestamp,
  * all-null), plus the invariance that makes the card trustworthy —
  * the same rows under any partitioning profile identically.
  */
class ProfileSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def fixture = Seq(
    (1L, Some(2.5), Some("b"), Some(Timestamp.valueOf("2024-01-02 03:04:05")), Option.empty[Long]),
    (2L, Some(2.5), Some("a"), Some(Timestamp.valueOf("2023-12-31 23:59:59")), Option.empty[Long]),
    (3L, None, None, None, Option.empty[Long]),
    (4L, Some(-1.011), Some("c"), Some(Timestamp.valueOf("2024-06-01 00:00:00")), Option.empty[Long])
  ).toDF("id", "price", "tag", "ts", "dead")

  private def card(df: org.apache.spark.sql.DataFrame) =
    Profile.columnProfile(df)
      .as[(String, Long, Long, Option[String], Option[String])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("profile card: every rendering arm exact") {
    val got = card(fixture)
    assert(got("id") === ((0L, 4L, Some("1"), Some("4"))))
    // floats profile through floor(x*100): 2.5→250 (x1 distinct),
    // -1.011→-102 (floor toward -inf)
    assert(got("price") === ((1L, 2L, Some("-102"), Some("250"))))
    assert(got("tag") === ((1L, 3L, Some("a"), Some("c"))))
    assert(got("ts") === ((1L, 3L,
      Some("2023-12-31 23:59:59"), Some("2024-06-01 00:00:00"))))
    // all-null: zero distinct, null range
    assert(got("dead") === ((4L, 0L, None, None)))
  }

  test("profile is partitioning-invariant") {
    val base = card(fixture)
    assert(card(fixture.repartition(7)) === base)
    assert(card(fixture.orderBy(col("id").desc)) === base)
  }

  test("single pass: one scan feeds the whole card") {
    val plan = Profile.columnProfile(fixture).queryExecution.optimizedPlan
    val scans = plan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }
    assert(scans.size === 1, "profile must not re-scan per column")
  }

  test("zero-column frame is refused") {
    intercept[IllegalArgumentException] {
      Profile.columnProfile(spark.emptyDataFrame)
    }
  }
}
