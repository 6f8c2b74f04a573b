package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[RankFusion]]: the ≤-cumulative rank law (ties included), fusion
  * arithmetic vs a hand model, and determinism of the fused order. */
class RankFusionSpec extends AnyFunSuite with SparkTestSession {

  test("ranks and fusion match the #{x <= v}/N model, ties included") {
    import spark.implicits._
    val rows = Seq(
      (1L, 10L, 5L), (2L, 10L, 7L), (3L, 20L, 5L), (4L, 30L, 1L))
    val df = rows.toDF("doc_id", "a", "b")
    def rank(vals: Seq[Long], v: Long): Long =
      1000000L * vals.count(_ <= v) / vals.length
    val as = rows.map(_._2); val bs = rows.map(_._3)
    val want = rows.map { case (id, a, b) =>
      val (ra, rb) = (rank(as, a), rank(bs, b))
      (id, ra, rb, (ra + rb) / 2)
    }.toSet
    val got = RankFusion.fuse(df, "doc_id", Seq("a", "b")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === want)
  }

  test("fused order is deterministic across partitionings") {
    import spark.implicits._
    val df = (0 until 200).map(i =>
      (i.toLong, (i * 7 % 31).toLong, (i * 13 % 17).toLong))
      .toDF("doc_id", "a", "b")
    def queue(d: org.apache.spark.sql.DataFrame) =
      RankFusion.fuse(d, "doc_id", Seq("a", "b"))
        .orderBy(col("fused_ppm"), col("doc_id")).limit(10)
        .collect().map(_.getLong(0)).toSeq
    assert(queue(df) === queue(df.repartition(13)))
  }
}
