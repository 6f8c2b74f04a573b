package graft.geo

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Spatial grid partitioning: envelopes over every geometry shape,
  * boundary-exact cell assignment, and the unparsable-WKB null
  * contract. */
class GeoGridSpec extends AnyFunSuite with SparkTestSession {

  private def pt(x: Double, y: Double) =
    Wkb.GPoint(Array(x, y), hasZ = false, hasM = false)

  test("envelope covers all vertices across geometry shapes") {
    val line = Wkb.GLineString(Array(Array(-3.0, 2.0), Array(7.0, -1.0)), false, false)
    assert(GeoGrid.envelope(line) == ((-3.0, -1.0, 7.0, 2.0)))
    val poly = Wkb.GPolygon(Array(Array(
      Array(0.0, 0.0), Array(4.0, 0.0), Array(4.0, 5.0), Array(0.0, 0.0))), false, false)
    assert(GeoGrid.envelope(poly) == ((0.0, 0.0, 4.0, 5.0)))
    val coll = Wkb.GCollection(Array(pt(-10.0, 3.0), line), false, false)
    assert(GeoGrid.envelope(coll) == ((-10.0, -1.0, 7.0, 3.0)))
  }

  test("cell assignment: boundary lands in the upper cell, negatives floor down") {
    assert(GeoGrid.cellOf(pt(10.0, -0.1), 10.0) == Some((1L, -1L)))
    assert(GeoGrid.cellOf(pt(9.999, 0.0), 10.0) == Some((0L, 0L)))
    assert(GeoGrid.cellOf(pt(-20.0, -20.0), 10.0) == Some((-2L, -2L)))
    // a line's cell comes from its envelope center
    val line = Wkb.GLineString(Array(Array(0.0, 0.0), Array(30.0, 0.0)), false, false)
    assert(GeoGrid.cellOf(line, 10.0) == Some((1L, 0L))) // center x = 15
    // EMPTY geometries must not grid: a NaN/infinite center would
    // otherwise floor to cell (0,0) and pair with origin-adjacent data
    assert(GeoGrid.cellOf(Wkb.GLineString(Array.empty, false, false), 10.0).isEmpty)
    assert(GeoGrid.cellOf(
      pt(Double.NaN, 1.0), 10.0).isEmpty)
  }

  test("neighborPairs: equals brute force across cell boundaries; exactly once each") {
    import spark.implicits._
    // points at x = 3i: consecutive pairs are 3 apart (within 5),
    // skip-pairs 6 apart (outside); several pairs straddle a cell edge
    val rows = (0 until 20).map(i => (i.toLong, Wkb.write(pt(i * 3.0, 0.0))))
      .toDF("id", "wkb")
    val got = GeoGrid.neighborPairs(rows, col("id"), col("wkb"),
        cellSize = 10.0, maxDist = 5.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == got.toSet.size, "a pair was emitted twice")
    val expected = (0 until 19).map(i =>
      (i.toLong, i + 1L, 3000000L * 3000000L)).toSet
    assert(got.toSet == expected)
    // cellSize < maxDist must be refused, not silently lossy
    intercept[IllegalArgumentException] {
      GeoGrid.neighborPairs(rows, col("id"), col("wkb"), 4.0, 5.0)
    }
  }

  test("neighborPairs cap: dense cell rank-truncates, sparse pairs untouched") {
    import spark.implicits._
    // 10 coincident points in one cell + a sparse pair elsewhere;
    // cap 4 → C(4,2)=6 pairs among the dense cell's first 4 ids, and
    // the sparse pair survives unchanged
    val rows = ((0 until 10).map(i => (i.toLong, Wkb.write(pt(5.0, 5.0)))) ++
      Seq((100L, Wkb.write(pt(25.0, 5.0))), (101L, Wkb.write(pt(27.0, 5.0)))))
      .toDF("id", "wkb")
    val got = GeoGrid.neighborPairs(rows, col("id"), col("wkb"),
        cellSize = 10.0, maxDist = 5.0, maxCellPoints = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val densePairs = (for { a <- 0 until 4; b <- (a + 1) until 4 } yield (a.toLong, b.toLong)).toSet
    assert(got == densePairs + ((100L, 101L)))
  }

  test("containsPoint: non-convex shapes and holes follow even-odd semantics") {
    // L-shape: (0,0)-(4,0)-(4,2)-(2,2)-(2,4)-(0,4)
    val l = Wkb.GPolygon(Array(Array(
      Array(0.0, 0.0), Array(4.0, 0.0), Array(4.0, 2.0), Array(2.0, 2.0),
      Array(2.0, 4.0), Array(0.0, 4.0), Array(0.0, 0.0))), false, false)
    assert(GeoGrid.containsPoint(l, 1.0, 1.0))   // in the thick part
    assert(GeoGrid.containsPoint(l, 1.0, 3.0))   // in the vertical arm
    assert(!GeoGrid.containsPoint(l, 3.0, 3.0))  // in the notch
    assert(!GeoGrid.containsPoint(l, 5.0, 1.0))  // outside
    // square with a square hole: the hole flips parity back out
    val holed = Wkb.GPolygon(Array(
      Array(Array(0.0, 0.0), Array(10.0, 0.0), Array(10.0, 10.0),
        Array(0.0, 10.0), Array(0.0, 0.0)),
      Array(Array(4.0, 4.0), Array(6.0, 4.0), Array(6.0, 6.0),
        Array(4.0, 6.0), Array(4.0, 4.0))), false, false)
    assert(GeoGrid.containsPoint(holed, 1.0, 1.0))
    assert(!GeoGrid.containsPoint(holed, 5.0, 5.0)) // inside the hole
  }

  test("containmentJoin: grid candidates + ray cast equal the direct definition") {
    import spark.implicits._
    val poly = Wkb.GPolygon(Array(Array(
      Array(10.0, 10.0), Array(30.0, 10.0), Array(30.0, 30.0),
      Array(10.0, 30.0), Array(10.0, 10.0))), false, false)
    val polys = Seq((1L, Wkb.write(poly))).toDF("gid", "gwkb")
    val points = Seq(
      (1L, pt(15.0, 15.0)),  // inside (spans a different cell than (25,25))
      (2L, pt(25.0, 25.0)),  // inside, other corner cell
      (3L, pt(35.0, 15.0)),  // outside, adjacent cell
      (4L, pt(15.0, 35.0))). // outside
      map { case (id, p) => (id, Wkb.write(p)) }.toDF("pid", "pwkb")
    val got = GeoGrid.containmentJoin(points, col("pid"), col("pwkb"),
        polys, col("gid"), col("gwkb"), cellSize = 10.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 1L), (2L, 1L)))
    // a point INSIDE but within one micro-unit of the envelope edge:
    // the fixed-point prefilter must stay conservative (inclusive) and
    // let the exact ray cast decide — a strict compare dropped it
    val edgePts = Seq((9L, Wkb.write(pt(10.0000005, 20.0))))
      .toDF("pid", "pwkb")
    val edge = GeoGrid.containmentJoin(edgePts, col("pid"), col("pwkb"),
        polys, col("gid"), col("gwkb"), cellSize = 10.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edge == Set((9L, 1L)),
      "inside point a micro-unit from the envelope edge was pruned before the verify")
  }

  test("gridCells: WKB round-trip, unparsable bytes → null cells, row survives") {
    import spark.implicits._
    val rows = Seq(
      (1L, Wkb.write(pt(25.0, -35.0))),
      (2L, Array[Byte](1, 1)), // truncated garbage
      (3L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "wkb")
    val got = GeoGrid.gridCells(rows, col("wkb"), 10.0)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some((r.getLong(2), r.getLong(3))))).toMap
    assert(got(1L) == Some((2L, -4L)))
    assert(got(2L).isEmpty && got(3L).isEmpty)
  }
}
