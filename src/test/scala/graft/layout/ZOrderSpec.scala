package graft.layout

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Morton interleave: exactness against a bit-twiddling reference and
  * the locality property that justifies z-ordered layouts. */
class ZOrderSpec extends AnyFunSuite with SparkTestSession {

  private def zRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("zExprSql matches the bit-twiddling reference on the full 4-bit grid") {
    import spark.implicits._
    val pts = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        expr(ZOrder.zExprSql("x", "y", 4, "div")).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) === zRef(x, y, 4), s"($x, $y)")
    }
    // the interleave is a bijection on the grid
    assert(got.values.toSet.size === 256)
  }

  test("curve buckets envelope both dimensions tightly (the zone-map property)") {
    import spark.implicits._
    val pts = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val spans = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        expr(ZOrder.zExprSql("x", "y", 4, "div")).as("z"))
      .groupBy(expr("z div 16").as("b"))
      .agg((max(col("x")) - min(col("x"))).as("xs"),
        (max(col("y")) - min(col("y"))).as("ys"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    // 16 z-values per bucket = 2 low bits per dimension: every bucket
    // spans at most 4 values in EACH dimension — a lexicographic sort
    // at the same granularity leaves the trailing dimension unbounded
    assert(spans.nonEmpty)
    spans.foreach { case (xs, ys) =>
      assert(xs <= 3L && ys <= 3L, s"bucket spans ($xs, $ys)")
    }
  }
}
