package graft.geo

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Integer shoelace shape statistics: hand-computed areas, hole
  * subtraction, orientation independence, and the null/unscorable
  * contract. */
class GeoStatsSpec extends AnyFunSuite with SparkTestSession {

  private def rect(x0: Double, y0: Double, x1: Double, y1: Double) =
    Wkb.GPolygon(Array(Array(Array(x0, y0), Array(x1, y0), Array(x1, y1),
      Array(x0, y1), Array(x0, y0))), false, false)

  test("polyArea2Fp: rects, holes, orientation, multipolygon, L-shape") {
    // 4×3 rect → 2·area in fp² = 2·(4e6·3e6)
    assert(GeoStats.polyArea2Fp(Array(rect(0, 0, 4, 3))) == Some(2L * 4000000L * 3000000L))
    // translation invariance, far from the origin
    assert(GeoStats.polyArea2Fp(Array(rect(70000, -30000, 70004, -29997))) ==
      Some(2L * 4000000L * 3000000L))
    // reversed (CW) ring: same area by the part-level abs
    val cw = Wkb.GPolygon(Array(rect(0, 0, 4, 3).rings(0).reverse), false, false)
    assert(GeoStats.polyArea2Fp(Array(cw)) == Some(2L * 4000000L * 3000000L))
    // hole subtracts: 10×10 outer minus 2×2 hole (hole ring CW)
    val holed = Wkb.GPolygon(Array(
      rect(0, 0, 10, 10).rings(0),
      Wkb.GPolygon(Array(rect(4, 4, 6, 6).rings(0).reverse), false, false).rings(0)),
      false, false)
    assert(GeoStats.polyArea2Fp(Array(holed)) == Some(2L * 96L * 1000000L * 1000000L))
    // a hole wound the SAME way as its shell is legal WKB and must
    // still subtract — ring POSITION decides, not winding
    val sameWind = Wkb.GPolygon(Array(
      rect(0, 0, 10, 10).rings(0), rect(4, 4, 6, 6).rings(0)), false, false)
    assert(GeoStats.polyArea2Fp(Array(sameWind)) == Some(2L * 96L * 1000000L * 1000000L))
    // holes outweighing their shell: invalid geometry → unscorable
    val inverted = Wkb.GPolygon(Array(
      rect(4, 4, 6, 6).rings(0), rect(0, 0, 10, 10).rings(0)), false, false)
    assert(GeoStats.polyArea2Fp(Array(inverted)).isEmpty)
    // multipolygon: parts sum
    assert(GeoStats.polyArea2Fp(Array(rect(0, 0, 1, 1), rect(5, 5, 7, 6))) ==
      Some(2L * 1000000L * 1000000L + 2L * 2000000L * 1000000L))
    // non-convex L-shape: 40×40 minus the 20×20 notch = 1200 units²
    val l = Wkb.GPolygon(Array(Array(
      Array(0.0, 0.0), Array(40.0, 0.0), Array(40.0, 20.0), Array(20.0, 20.0),
      Array(20.0, 40.0), Array(0.0, 40.0), Array(0.0, 0.0))), false, false)
    assert(GeoStats.polyArea2Fp(Array(l)) == Some(2L * 1200L * 1000000L * 1000000L))
    // NaN coordinate → unscorable
    assert(GeoStats.polyArea2Fp(Array(Wkb.GPolygon(Array(Array(
      Array(Double.NaN, 0.0), Array(1.0, 0.0), Array(1.0, 1.0),
      Array(Double.NaN, 0.0))), false, false))).isEmpty)
  }

  test("shapeStats: counts, null contract, curved surface via linearization") {
    import spark.implicits._
    val circleRing = Wkb.GCircularString(Array(
      Array(0.0, 10.0), Array(10.0, 20.0), Array(20.0, 10.0),
      Array(10.0, 0.0), Array(0.0, 10.0)), false, false)
    val rows = Seq(
      (1L, Wkb.write(rect(0, 0, 4, 3))),
      (2L, Array[Byte](9, 9)),                     // unparsable
      (3L, Wkb.write(Wkb.GLineString(                // not a polygon
        Array(Array(0.0, 0.0), Array(1.0, 1.0)), false, false))),
      (4L, Wkb.write(Wkb.GCurvePolygon(Array(circleRing), false, false)))
    ).toDF("id", "wkb")
    val got = GeoStats.shapeStats(rows, col("id"), col("wkb"))
      .collect().map(r => r.getLong(0) -> (
        if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))))
      .toMap
    assert(got(1L) == Some((1L, 5L, Some(2L * 4000000L * 3000000L))))
    assert(got(2L).isEmpty && got(3L).isEmpty, "null stats rows must survive")
    // the linearized circle of radius 10: area approaches π·100 from
    // below (inscribed polygon) — must be well inside (250, 315) and
    // the ring must carry the sampled vertex count
    val (nr, nv, area) = got(4L).get
    assert(nr == 1L && nv > 10L)
    val areaUnits = area.get.toDouble / 2e12
    assert(areaUnits > 250.0 && areaUnits < math.Pi * 100.0,
      s"linearized circle area $areaUnits out of range")
  }

  private def poly(pts: (Double, Double)*) =
    Wkb.GPolygon(Array((pts :+ pts.head).map { case (x, y) =>
      Array(x, y) }.toArray), false, false)

  test("intersectionArea2Fp: exact clips, rational floors, fallbacks") {
    def area(a: Wkb.GPolygon, b: Wkb.GPolygon) =
      GeoStats.intersectionArea2Fp(Array(a), Array(b))
    // rect ∩ rect: 2×1 overlap → doubled fp² area 2·(2e6·1e6)
    assert(area(rect(0, 0, 4, 3), rect(2, 2, 6, 6)) ===
      ((Some(2L * 2000000L * 1000000L), true)))
    // commutes
    assert(area(rect(2, 2, 6, 6), rect(0, 0, 4, 3)) ===
      ((Some(2L * 2000000L * 1000000L), true)))
    // triangle ∩ rect: the x ≥ 1 slice of the (0,0)-(2,0)-(0,2)
    // triangle is a half-unit triangle → doubled fp² area 1e12
    assert(area(poly((0, 0), (2, 0), (0, 2)), rect(1, 0, 3, 3)) ===
      ((Some(1000000000000L), true)))
    // rational intersection: unit right triangle ∩ unit right triangle
    // mirrored → intersection area 1/4, doubled = 1/2 in units →
    // 0.5e12 fp², exactly representable; the clip's rational vertices
    // (the hypotenuses cross at (1/2, 1/2)) must not drift
    assert(area(poly((0, 0), (1, 0), (0, 1)), poly((1, 0), (1, 1), (0, 0))) ===
      ((Some(500000000000L), true)))
    // disjoint convex pair → zero area, still exact
    assert(area(rect(0, 0, 1, 1), rect(5, 5, 6, 6)) === ((Some(0L), true)))
    // concave subject against a convex clip stays exact (S-H bridge
    // edges are zero-area): L-shape ∩ rect covering its notch column.
    // L = 4×4 minus the 2×2 top-right notch; clip x∈[2,4],y∈[0,4]
    // overlaps only the L's bottom-right 2×2 arm → doubled 2·4e12
    val lShape = poly((0, 0), (4, 0), (4, 2), (2, 2), (2, 4), (0, 4))
    assert(area(lShape, rect(2, 0, 4, 4)) ===
      ((Some(2L * 2000000L * 2000000L), true)))
    // two concave rings, disjoint: the triangulated clip path is
    // exact now — true zero, not an envelope guess
    val lb = poly((10, 0), (14, 0), (14, 2), (12, 2), (12, 4), (10, 4))
    assert(GeoStats.intersectionArea2Fp(Array(lShape), Array(lb)) ===
      ((Some(0L), true)))
    // concave ⋈ concave, overlapping: L ∩ (L + (1,1)). By region
    // algebra ([0,4]×[0,2] ∪ [0,2]×[2,4]) ∩ ([1,5]×[1,3] ∪ [1,3]×[3,5])
    // = [1,4]×[1,2] + [1,2]×[2,3] + [1,2]×[3,4] = 5 units², doubled 1e13
    val lShift = poly((1, 1), (5, 1), (5, 3), (3, 3), (3, 5), (1, 5))
    assert(area(lShape, lShift) === ((Some(10000000000000L), true)))
    assert(area(lShift, lShape) === ((Some(10000000000000L), true)))
    // multipolygon → fallback flag
    val multi = GeoStats.intersectionArea2Fp(
      Array(rect(0, 0, 1, 1), rect(2, 0, 3, 1)), Array(rect(0, 0, 3, 1)))
    assert(multi._2 === false)
  }

  test("earTriangulate: L-ring partitions into triangles summing to its area") {
    val ring = Array((0L, 0L), (4000000L, 0L), (4000000L, 2000000L),
      (2000000L, 2000000L), (2000000L, 4000000L), (0L, 4000000L))
    val tris = GeoStats.earTriangulate(ring)
    assert(tris.length === 4, "n-2 triangles for a simple hexagon")
    val total = tris.map { t =>
      val p = Wkb.GPolygon(Array((t :+ t.head).map { case (x, y) =>
        Array(x / 1e6, y / 1e6) }), false, false)
      GeoStats.polyArea2Fp(Array(p)).get
    }.sum
    assert(total === 2L * 12L * 1000000L * 1000000L)
  }

  test("transient shoelace overflow: representable area stays scorable") {
    // the round-11 falsifying triangle: one translated cross term
    // overflows a Long (≈9.25e18) while the final doubled area fits —
    // the ring must still score, and self-clip must reproduce it
    val tri = poly((240.5195, 5502.4121), (-2708.8396, 3015.2773),
      (1012.0769, 3621.0628))
    val own = GeoStats.polyArea2Fp(Array(tri))
    assert(own.isDefined && own.get > 0L)
    assert(GeoStats.intersectionArea2Fp(Array(tri), Array(tri)) ===
      ((own, true)))
  }
}
