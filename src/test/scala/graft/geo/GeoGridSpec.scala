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

  test("envelope: a circular arc bulging past its control points is covered") {
    // circle center (0,2) radius 2; the arc runs from (0,0) at -90°
    // CCW through 45° to (0,4) at 90°, so it passes the max-x point
    // (2,2) at 0° — which is NOT a control point: the control bbox
    // stops at x = √2 ≈ 1.414 while the true curve reaches x = 2.
    // Before linearize-before-envelope this arc would grid-index as if
    // it never left x ≤ 1.415 and miss its apex cells.
    val s2 = math.sqrt(2.0)
    val arc = Wkb.GCircularString(Array(
      Array(0.0, 0.0), Array(s2, 2.0 + s2), Array(0.0, 4.0)), false, false)
    val (minX, minY, maxX, maxY) = GeoGrid.envelope(arc)
    assert(maxX > 1.99 && maxX <= 2.0001, s"arc apex not covered: maxX=$maxX")
    assert(minX >= -0.0001 && minY >= -0.0001 && maxY <= 4.0001)
  }

  test("segmentsIntersect: crossing, touching, collinear, disjoint") {
    val f = GeoGrid.segmentsIntersect _
    assert(f(0, 0, 4, 4, 0, 4, 4, 0))      // proper X crossing
    assert(!f(0, 0, 1, 1, 2, 2.5, 3, 3.5)) // disjoint, parallel-ish
    assert(f(0, 0, 4, 0, 2, 0, 2, 3))      // T-touch: endpoint on interior
    assert(f(0, 0, 2, 0, 2, 0, 4, 2))      // shared endpoint
    assert(f(0, 0, 3, 0, 2, 0, 5, 0))      // collinear overlap
    assert(!f(0, 0, 1, 0, 2, 0, 3, 0))     // collinear disjoint
  }

  test("polygonsIntersect: notch, hole, containment, plus-sign") {
    def rect(x0: Double, y0: Double, x1: Double, y1: Double) =
      Wkb.GPolygon(Array(Array(Array(x0, y0), Array(x1, y0), Array(x1, y1),
        Array(x0, y1), Array(x0, y0))), false, false)
    val l = Wkb.GPolygon(Array(Array(
      Array(0.0, 0.0), Array(40.0, 0.0), Array(40.0, 20.0), Array(20.0, 20.0),
      Array(20.0, 40.0), Array(0.0, 40.0), Array(0.0, 0.0))), false, false)
    val holed = Wkb.GPolygon(Array(
      Array(Array(0.0, 0.0), Array(100.0, 0.0), Array(100.0, 100.0),
        Array(0.0, 100.0), Array(0.0, 0.0)),
      Array(Array(20.0, 20.0), Array(80.0, 20.0), Array(80.0, 80.0),
        Array(20.0, 80.0), Array(20.0, 20.0))), false, false)
    def hit(a: Wkb.GPolygon, b: Wkb.GPolygon) =
      GeoGrid.polygonsIntersect(Array(a), Array(b))
    // envelope overlap but geometrically disjoint: rect in the L notch
    assert(!hit(l, rect(25, 25, 35, 35)))
    assert(!hit(rect(25, 25, 35, 35), l)) // symmetric
    // rect fully inside the hole: even-odd says outside
    assert(!hit(holed, rect(30, 30, 70, 70)))
    // rect crossing the hole boundary intersects the solid band
    assert(hit(holed, rect(10, 40, 30, 50)))
    // containment: all vertices of the small rect inside the L arm
    assert(hit(l, rect(2, 2, 8, 8)))
    // plus-sign: bars cross, no vertex of either inside the other
    assert(hit(rect(0, 10, 30, 20), rect(10, 0, 20, 30)))
  }

  test("overlapJoin: L-shape and hole cases match geometry, each pair once") {
    import spark.implicits._
    def rectWkb(x0: Double, y0: Double, x1: Double, y1: Double) =
      Wkb.write(Wkb.GPolygon(Array(Array(Array(x0, y0), Array(x1, y0),
        Array(x1, y1), Array(x0, y1), Array(x0, y0))), false, false))
    val lShape = Wkb.write(Wkb.GPolygon(Array(Array(
      Array(0.0, 0.0), Array(40.0, 0.0), Array(40.0, 20.0), Array(20.0, 20.0),
      Array(20.0, 40.0), Array(0.0, 40.0), Array(0.0, 0.0))), false, false))
    val holed = Wkb.write(Wkb.GPolygon(Array(
      Array(Array(60.0, 60.0), Array(160.0, 60.0), Array(160.0, 160.0),
        Array(60.0, 160.0), Array(60.0, 60.0)),
      Array(Array(80.0, 80.0), Array(140.0, 80.0), Array(140.0, 140.0),
        Array(80.0, 140.0), Array(80.0, 80.0))), false, false))
    val a = Seq((1L, lShape), (2L, holed)).toDF("aid", "awkb")
    val b = Seq(
      (10L, rectWkb(25, 25, 35, 35)),    // in the L notch → no
      (11L, rectWkb(90, 90, 130, 130)),  // inside the hole → no
      (12L, rectWkb(70, 100, 100, 110)), // crosses the hole boundary → yes
      (13L, rectWkb(10, -10, 15, 50)),   // plus-sign through the L → yes
      (14L, rectWkb(300, 300, 310, 310)) // far away, no shared cell
    ).toDF("bid", "bwkb")
    val got = GeoGrid.overlapJoin(a, col("aid"), col("awkb"),
        b, col("bid"), col("bwkb"), cellSize = 10.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.toSet.size,
      "a multi-cell pair was emitted more than once — ownership dedup broken")
    assert(got.toSet == Set((2L, 12L), (1L, 13L)))
  }

  test("overlapJoin equals brute-force rectangle overlap on a synthesized corpus") {
    import spark.implicits._
    // .05 vs .17 extent fractions: no edge coincidence, so strict
    // interval overlap is the unambiguous ground truth (q81's corpus
    // construction at spec scale)
    def corpus(n: Int, frac: Double): Seq[(Long, Double, Double, Double)] =
      (0 until n).map { i =>
        val id = i.toLong
        (id, (id * 37 % 100).toDouble - 50.0, (id * 91 % 100).toDouble - 50.0,
          (id % 4).toDouble + 3.0 + frac)
      }
    def toDf(rows: Seq[(Long, Double, Double, Double)]) =
      rows.map { case (id, cx, cy, w) =>
        (id, Wkb.write(Wkb.GPolygon(Array(Array(
          Array(cx - w, cy - w), Array(cx + w, cy - w), Array(cx + w, cy + w),
          Array(cx - w, cy + w), Array(cx - w, cy - w))), false, false)))
      }.toDF("id", "wkb")
    val ra = corpus(40, 0.05)
    val rb = corpus(40, 0.17)
    val brute = (for {
      (ia, ax, ay, aw) <- ra
      (ib, bx, by, bw) <- rb
      if ax - aw < bx + bw && bx - bw < ax + aw &&
        ay - aw < by + bw && by - bw < ay + aw
    } yield (ia, ib)).toSet
    val got = GeoGrid.overlapJoin(toDf(ra), col("id"), col("wkb"),
        toDf(rb), col("id"), col("wkb"), cellSize = 10.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.toSet.size)
    assert(got.toSet == brute)
  }

  test("containmentJoin: a CurvePolygon participates via its linearization") {
    import spark.implicits._
    // full circle of radius 10 at (10,10) as two circular-arc triplets
    val ring = Wkb.GCircularString(Array(
      Array(0.0, 10.0), Array(10.0, 20.0), Array(20.0, 10.0),
      Array(10.0, 0.0), Array(0.0, 10.0)), false, false)
    val curvePoly = Wkb.GCurvePolygon(Array(ring), false, false)
    val polys = Seq((1L, Wkb.write(curvePoly))).toDF("gid", "gwkb")
    val points = Seq((1L, Wkb.write(pt(10.0, 10.0))),   // center → inside
      (2L, Wkb.write(pt(25.0, 10.0))))                   // outside
      .toDF("pid", "pwkb")
    val got = GeoGrid.containmentJoin(points, col("pid"), col("pwkb"),
        polys, col("gid"), col("gwkb"), cellSize = 10.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // before round 9 the index accepted the CurvePolygon but the
    // verify could never match it → silent zero matches
    assert(got == Set((1L, 1L)))
    // while a LINESTRING on the polys side is excluded at index build
    val line = Seq((9L, Wkb.write(Wkb.GLineString(
      Array(Array(0.0, 0.0), Array(20.0, 20.0)), false, false)))).toDF("gid", "gwkb")
    assert(GeoGrid.containmentJoin(points, col("pid"), col("pwkb"),
      line, col("gid"), col("gwkb"), cellSize = 10.0).count() == 0)
  }

  test("containmentJoin decodes a hot polygon once per partition, not per candidate") {
    import spark.implicits._
    val poly = Wkb.write(Wkb.GPolygon(Array(Array(
      Array(0.0, 0.0), Array(100.0, 0.0), Array(100.0, 100.0),
      Array(0.0, 100.0), Array(0.0, 0.0))), false, false))
    val polys = Seq((1L, poly)).toDF("gid", "gwkb")
    val points = (0 until 300).map { i =>
      (i.toLong, Wkb.write(pt((i % 20) * 4.5 + 2.25, (i / 20) * 6.0 + 3.0)))
    }.toDF("pid", "pwkb")
    GeoGrid.verifyDecodes.set(0L)
    val n = GeoGrid.containmentJoin(points, col("pid"), col("pwkb"),
      polys, col("gid"), col("gwkb"), cellSize = 10.0).count()
    assert(n == 300L)
    val decodes = GeoGrid.verifyDecodes.get()
    // one per partition that holds candidates (32 shuffle partitions),
    // never one per candidate row
    assert(decodes <= 64L, s"hot polygon decoded $decodes times for 300 candidates")
  }

  test("containmentJoin memo engages across MANY polygons (filter stays above the sort)") {
    import spark.implicits._
    // 20 disjoint polygons, 50 points each → 1000 candidates. With the
    // verify pushed below the sort into the join (what a deterministic
    // UDF predicate invites Catalyst to do), every candidate row
    // decodes its polygon: 1000 decodes. With the filter pinned above
    // sortWithinPartitions, each partition decodes each distinct
    // polygon once: ≤ 20 polys × 32 partitions = 640, in practice far
    // fewer. The single-polygon test above cannot tell these apart —
    // its memo hits regardless of row order.
    val polys = (0 until 20).map { k =>
      (k.toLong, Wkb.write(Wkb.GPolygon(Array(Array(
        Array(k * 200.0, 0.0), Array(k * 200.0 + 100.0, 0.0),
        Array(k * 200.0 + 100.0, 100.0), Array(k * 200.0, 100.0),
        Array(k * 200.0, 0.0))), false, false)))
    }.toDF("gid", "gwkb")
    val points = (0 until 1000).map { i =>
      val k = i / 50; val j = i % 50
      (i.toLong, Wkb.write(pt(k * 200.0 + (j % 10) * 9.5 + 2.5, (j / 10) * 19.0 + 3.0)))
    }.toDF("pid", "pwkb")
    GeoGrid.verifyDecodes.set(0L)
    val n = GeoGrid.containmentJoin(points, col("pid"), col("pwkb"),
      polys, col("gid"), col("gwkb"), cellSize = 10.0).count()
    assert(n == 1000L)
    val decodes = GeoGrid.verifyDecodes.get()
    assert(decodes <= 640L,
      s"verify decoded $decodes times for 1000 candidates over 20 polygons — " +
        "the memo is not engaging (filter likely pushed below the sort)")
  }

  test("cellSize beyond the Long-safe bound is refused") {
    import spark.implicits._
    val rows = Seq((1L, Wkb.write(pt(0.0, 0.0)))).toDF("id", "wkb")
    intercept[IllegalArgumentException] {
      GeoGrid.neighborPairs(rows, col("id"), col("wkb"),
        cellSize = 1100.0, maxDist = 1099.0)
    }
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

  test("gridAudit: every refusal class gets its reason; ok rows get cells") {
    import spark.implicits._
    val rows = Seq(
      (1L, null.asInstanceOf[Array[Byte]]),
      (2L, Array[Byte](9, 9, 9)),
      (3L, Wkb.write(Wkb.GLineString(Array.empty, false, false))),
      (4L, Wkb.write(pt(Double.NaN, 1.0))),
      (5L, Wkb.write(pt(9.5e12, 0.0))),
      (6L, Wkb.write(Wkb.GLineString(Array(
        Array(-3.0e7, 0.0), Array(3.0e7, 0.0)), false, false))),
      (7L, Wkb.write(pt(25.0, -35.0)))).toDF("id", "wkb")
    val got = GeoGrid.gridAudit(rows, col("id"), col("wkb"), 10.0)
      .collect().map(r => r.getLong(0) -> (r.getString(1),
        if (r.isNullAt(2)) None else Some((r.getLong(2), r.getLong(3))))).toMap
    assert(got(1L) === (("null_wkb", None)))
    assert(got(2L) === (("unparsable", None)))
    assert(got(3L) === (("empty_or_nan", None)))
    assert(got(4L) === (("empty_or_nan", None)))
    assert(got(5L) === (("coord_overflow", None)))
    assert(got(6L) === (("span_exceeded", None)))
    assert(got(7L) === (("ok", Some((2L, -4L)))))
    // the audit's admission verdict must agree with what gridCells
    // actually grids — one contract, two surfaces
    val gridded = GeoGrid.gridCells(rows, col("wkb"), 10.0)
      .collect().map(r => r.getLong(0) -> !r.isNullAt(2)).toMap
    got.foreach { case (id, (reason, _)) =>
      // gridCells has no span guard (it indexes centers, not ranges),
      // so span_exceeded rows still grid there; every OTHER refusal
      // must agree
      if (reason != "span_exceeded")
        assert(gridded(id) === (reason == "ok"), s"id $id: $reason vs gridCells")
    }
  }

  test("segWithinFp: clamp regions, degenerate segment, exact boundary") {
    // horizontal segment (0,0)-(10,0) in micro-units, r = 2
    val (ax, ay, bx, by) = (0L, 0L, 10000000L, 0L)
    val r = 2000000L
    // perpendicular region: distance is |y|
    assert(GeoGrid.segWithinFp(5000000L, 2000000L, ax, ay, bx, by, r))
    assert(!GeoGrid.segWithinFp(5000000L, 2000001L, ax, ay, bx, by, r))
    // before-A clamp: distance to A, diagonal
    assert(GeoGrid.segWithinFp(-1400000L, -1400000L, ax, ay, bx, by, r))
    assert(!GeoGrid.segWithinFp(-1500000L, -1500000L, ax, ay, bx, by, r))
    // past-B clamp: distance to B
    assert(GeoGrid.segWithinFp(12000000L, 0L, ax, ay, bx, by, r))
    assert(!GeoGrid.segWithinFp(12000001L, 0L, ax, ay, bx, by, r))
    // degenerate A==B behaves as point distance
    assert(GeoGrid.segWithinFp(1000000L, 1000000L, ax, ay, ax, ay, r))
    assert(!GeoGrid.segWithinFp(2000000L, 2000000L, ax, ay, ax, ay, r))
    // far coordinates: products overflow a long, BigInt must not wrap
    val big = 8000000000000000L // 8e15 micro-units = 8e9 units
    assert(!GeoGrid.segWithinFp(0L, big, -big, 0L, big, 0L, r))
    assert(GeoGrid.segWithinFp(0L, 1000000L, -big, 0L, big, 0L, r))
  }

  test("lineDistanceJoin equals brute force; multi-cell pairs exactly once") {
    import spark.implicits._
    def ls(pts: (Double, Double)*) = Wkb.write(Wkb.GLineString(
      pts.map { case (x, y) => Array(x, y) }.toArray, false, false))
    // line 0 spans four cells horizontally; line 1 is an L; line 2 far away
    val lines = Seq(
      (0L, ls((-14.0, 0.5), (26.0, 0.5))),
      (1L, ls((3.0, 3.0), (3.0, 12.0), (9.0, 12.0))),
      (2L, ls((80.0, 80.0), (90.0, 80.0)))).toDF("id", "wkb")
    val points = (0 until 60).map { i =>
      (100L + i, Wkb.write(pt(i * 1.37 - 15.0, (i % 7).toDouble - 1.0)))
    }.toDF("id", "wkb")
    val got = GeoGrid.lineDistanceJoin(points, col("id"), col("wkb"),
        lines, col("id"), col("wkb"), cellSize = 10.0, maxDist = 2.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // brute force in the same micro-unit integer arithmetic
    val segs = Map(
      0L -> Seq(((-14.0, 0.5), (26.0, 0.5))),
      1L -> Seq(((3.0, 3.0), (3.0, 12.0)), ((3.0, 12.0), (9.0, 12.0))),
      2L -> Seq(((80.0, 80.0), (90.0, 80.0))))
    def fp(v: Double) = math.floor(v * 1e6).toLong
    val expected = (for {
      i <- 0 until 60
      (lid, ss) <- segs
      hits = ss.count { case ((x1, y1), (x2, y2)) =>
        GeoGrid.segWithinFp(fp(i * 1.37 - 15.0), fp((i % 7).toDouble - 1.0),
          fp(x1), fp(y1), fp(x2), fp(y2), 2000000L)
      }
      if hits > 0
    } yield (100L + i, lid) -> hits.toLong).toMap
    assert(got === expected)
    assert(got.nonEmpty && got.keys.exists(_._2 == 0L) && got.keys.exists(_._2 == 1L))
  }

  test("lineDistanceJoin: curves linearize in; polygons and garbage drop out") {
    import spark.implicits._
    // a semicircle arc from (0,0) through (2,2) to (4,0): its apex is
    // reachable only via linearization (control-point walk misses it)
    val arc = Wkb.write(Wkb.GCircularString(
      Array(Array(0.0, 0.0), Array(2.0, 2.0), Array(4.0, 0.0)), false, false))
    val poly = Wkb.write(Wkb.GPolygon(Array(Array(
      Array(0.0, 0.0), Array(4.0, 0.0), Array(4.0, 4.0), Array(0.0, 0.0))), false, false))
    val lines = Seq((1L, arc), (2L, poly), (3L, Array[Byte](9, 9)),
      (4L, null.asInstanceOf[Array[Byte]])).toDF("id", "wkb")
    val points = Seq((10L, Wkb.write(pt(2.0, 2.5)))).toDF("id", "wkb")
    val got = GeoGrid.lineDistanceJoin(points, col("id"), col("wkb"),
        lines, col("id"), col("wkb"), cellSize = 10.0, maxDist = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.map(_._2).toSet === Set(1L),
      "the arc apex is within reach only if curves linearize into the index")
  }

  test("lineDistanceJoin: a world-spanning segment is excluded by the span cap") {
    import spark.implicits._
    def ls(pts: (Double, Double)*) = Wkb.write(Wkb.GLineString(
      pts.map { case (x, y) => Array(x, y) }.toArray, false, false))
    val lines = Seq(
      (1L, ls((-1.0e9, 0.0), (1.0e9, 0.0))), // 2e8 cells wide at cellSize=10
      (2L, ls((-5.0, 1.0), (5.0, 1.0)))).toDF("id", "wkb")
    val points = Seq((10L, Wkb.write(pt(0.0, 0.0)))).toDF("id", "wkb")
    val got = GeoGrid.lineDistanceJoin(points, col("id"), col("wkb"),
        lines, col("id"), col("wkb"), cellSize = 10.0, maxDist = 2.0)
      .collect().map(_.getLong(1)).toSet
    assert(got === Set(2L), "the giant segment must drop out, the normal one stays")
  }

  /** Brute-force kNN over micro-unit fixed-point coordinates — the
    * oracle the grid search must match exactly, ties included. */
  private def bruteKnn(qs: Seq[(Long, Double, Double)],
      cs: Seq[(Long, Double, Double)], k: Int): Set[(Long, Long, Long, Long)] = {
    def fp(v: Double) = math.floor(v * 1e6).toLong
    qs.flatMap { case (qid, qx, qy) =>
      cs.map { case (nid, nx, ny) =>
        val dx = fp(qx) - fp(nx); val dy = fp(qy) - fp(ny)
        (nid, dx * dx + dy * dy)
      }.sortBy { case (nid, d2) => (d2, nid) }.take(k).zipWithIndex
        .map { case ((nid, d2), i) => (qid, nid, d2, i + 1L) }
    }.toSet
  }

  test("knnJoin equals brute force on a sparse corpus (ring expansion required)") {
    import spark.implicits._
    // corpus density ≪ 1 per cell at cellSize=10: the nearest POI sits
    // in the 3×3 block but the 2nd-nearest is 3-4 rings out, so a
    // first-block-only search would return the wrong top-2 — and the
    // far-off query at x=200 exercises the jump-to-first-useful-ring
    // path (its home block is 17 cells from the corpus box)
    val qPts = Seq((0L, 0.0, 0.0), (1L, 5.0, 5.0), (2L, 200.0, 0.0),
      (3L, -15.0, -15.0))
    val cPts = Seq((100L, 1.0, 1.0), (101L, 35.0, 0.0), (102L, -42.0, 8.0))
    val queries = qPts.map { case (i, x, y) => (i, Wkb.write(pt(x, y))) }
      .toDF("id", "wkb")
    val corpus = cPts.map { case (i, x, y) => (i, Wkb.write(pt(x, y))) }
      .toDF("id", "wkb")
    val got = GeoGrid.knnJoin(queries, col("id"), col("wkb"),
        corpus, col("id"), col("wkb"), cellSize = 10.0, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === bruteKnn(qPts, cPts, 2))
  }

  test("knnJoin equals brute force on randomized corpora") {
    import spark.implicits._
    // seeded randomized sweep over corpus shapes, cell sizes, and k —
    // the termination proof has to hold wherever the points land
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val nq = 30
      val nc = 12 + rnd.nextInt(20)
      def xy() = (rnd.nextDouble() * 300 - 150, rnd.nextDouble() * 300 - 150)
      val qPts = (0 until nq).map { i => val (x, y) = xy(); (i.toLong, x, y) }
      val cPts = (0 until nc).map { i => val (x, y) = xy(); (100L + i, x, y) }
      val k = 1 + rnd.nextInt(4)
      val cellSize = 7.0 + rnd.nextInt(19)
      val queries = qPts.map { case (i, x, y) => (i, Wkb.write(pt(x, y))) }
        .toDF("id", "wkb")
      val corpus = cPts.map { case (i, x, y) => (i, Wkb.write(pt(x, y))) }
        .toDF("id", "wkb")
      val got = GeoGrid.knnJoin(queries, col("id"), col("wkb"),
          corpus, col("id"), col("wkb"), cellSize, k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      assert(got === bruteKnn(qPts, cPts, k),
        s"trial $trial (k=$k cellSize=$cellSize nc=$nc)")
    }
  }

  test("knnJoin: short lists under a small corpus, deterministic tie order") {
    import spark.implicits._
    // two POIs exactly equidistant from the query: the lower id must
    // take rank 1 (the (dist2, id) tie contract); k=3 over a corpus of
    // 2 yields exactly 2 rows, and an empty corpus yields none
    val queries = Seq((0L, Wkb.write(pt(0.0, 0.0)))).toDF("id", "wkb")
    val corpus = Seq((7L, Wkb.write(pt(5.0, 0.0))), (3L, Wkb.write(pt(-5.0, 0.0))))
      .toDF("id", "wkb")
    val got = GeoGrid.knnJoin(queries, col("id"), col("wkb"),
        corpus, col("id"), col("wkb"), cellSize = 10.0, k = 3)
      .collect().map(r => (r.getLong(1), r.getLong(3))).toSeq.sortBy(_._2)
    // fp coords: floor(-5·1e6) = -5000000, dist2 identical on both sides
    assert(got === Seq((3L, 1L), (7L, 2L)))
    val none = GeoGrid.knnJoin(queries, col("id"), col("wkb"),
      corpus.filter(col("id") < 0), col("id"), col("wkb"), 10.0, 2)
    assert(none.count() === 0L)
    assert(none.columns.toSeq ===
      Seq("query_id", "neighbor_id", "dist2_fp2", "nn_rank"))
  }
}
