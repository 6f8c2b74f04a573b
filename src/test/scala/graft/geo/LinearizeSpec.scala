package graft.geo

import org.scalatest.funsuite.AnyFunSuite

/** Behavior of curved→linear conversion against the reference contract
  * (`udfs/udf_conversions.py:12-59`,
  * `udfs/tests/wkb_registration_and_sql_tests.py:173-188`).
  */
class LinearizeSpec extends AnyFunSuite {

  private def hexOf(name: String): String =
    WkbCorpus.cases.find(_._1 == name).get._2
  private def bytesOf(name: String): Array[Byte] =
    Wkb.fromHex(hexOf(name)).get
  private def linType(name: String, step: Double = 5.0): String =
    GeomType.ofBytes(Linearize.curvedToLinearWkb(bytesOf(name), step))

  test("type mapping matches the reference's tested contract") {
    assert(linType("circularstring_2d") == "LineString")
    assert(linType("compoundcurve_2d") == "LineString")
    assert(linType("curvepolygon_2d") == "Polygon")
    assert(linType("multicurve_2d") == "MultiLineString")
    assert(linType("multisurface_2d") == "MultiPolygon")
  }

  test("linear types pass through with type preserved") {
    Seq("point_2d", "linestring_2d", "polygon_2d", "multipolygon_2d",
      "point_3d_z", "point_empty", "polygon_empty").foreach { n =>
      val expected = WkbCorpus.cases.find(_._1 == n).get._3
      assert(linType(n) == expected, s"case $n")
    }
  }

  test("EWKB input: SRID is stripped before conversion") {
    assert(linType("linestring_3d_z_ewkb") == "LineString Z")
    val out = Linearize.curvedToLinearWkb(bytesOf("point_2d_ewkb"), 5.0)
    assert(!Wkb.parseHeader(out).get.hasSrid)
  }

  test("null contract: null/garbage input → null (reference :58-59)") {
    assert(Linearize.curvedToLinearWkb(null, 5.0) == null)
    assert(Linearize.curvedToLinearWkb(Array[Byte](1, 1), 5.0) == null)
    assert(Linearize.curvedToLinearWkb(Array[Byte](9, 9, 9, 9, 9, 9), 5.0) == null)
  }

  test("smaller max angle step → at least as many vertices") {
    def nPts(step: Double): Int =
      Wkb.read(Linearize.curvedToLinearWkb(bytesOf("circularstring_2d"), step)).get
        .asInstanceOf[Wkb.GLineString].pts.length
    assert(nPts(1.0) >= nPts(5.0))
    assert(nPts(5.0) >= nPts(45.0))
    assert(nPts(45.0) >= 3) // endpoints + midpoint at minimum
  }

  test("step 0.0 falls back to the 4-degree OGR default") {
    val explicit = Wkb.read(Linearize.curvedToLinearWkb(bytesOf("circularstring_2d"), 4.0)).get
      .asInstanceOf[Wkb.GLineString].pts.length
    val default = Wkb.read(Linearize.curvedToLinearWkb(bytesOf("circularstring_2d"), 0.0)).get
      .asInstanceOf[Wkb.GLineString].pts.length
    assert(default == explicit)
  }

  test("curve polygon rings stay closed after linearization") {
    val poly = Wkb.read(Linearize.curvedToLinearWkb(bytesOf("curvepolygon_2d"), 5.0)).get
      .asInstanceOf[Wkb.GPolygon]
    poly.rings.foreach { ring =>
      assert(ring.length >= 4)
      assert(java.util.Arrays.equals(ring.head, ring.last))
    }
  }

  test("compound curve joints are not duplicated") {
    val line = Wkb.read(Linearize.curvedToLinearWkb(bytesOf("compoundcurve_2d"), 5.0)).get
      .asInstanceOf[Wkb.GLineString]
    line.pts.sliding(2).foreach { case Array(a, b) =>
      assert(!java.util.Arrays.equals(a, b), "adjacent duplicate vertex")
    }
    // endpoints of the original compound curve are preserved
    assert(line.pts.head(0) == 0.0 && line.pts.head(1) == 0.0)
    assert(line.pts.last(0) == 3.0 && line.pts.last(1) == 5.0)
  }

  test("Z values interpolate linearly along the arc") {
    val circZ = Wkb.GCircularString(
      Array(Array(1.0, 0.0, 10.0), Array(0.0, 1.0, 20.0), Array(-1.0, 0.0, 30.0)),
      hasZ = true, hasM = false)
    val out = Linearize.linearize(circZ, 5.0).asInstanceOf[Wkb.GLineString]
    assert(out.hasZ && !out.hasM)
    assert(out.pts.head(2) == 10.0 && out.pts.last(2) == 30.0)
    // monotone between endpoints, and every vertex stays on the unit circle
    out.pts.sliding(2).foreach { case Array(a, b) => assert(a(2) <= b(2)) }
    out.pts.foreach(p => assert(math.abs(math.hypot(p(0), p(1)) - 1.0) < 1e-9))
  }

  test("geometry collections linearize their children") {
    val coll = Wkb.GCollection(Array(
      Wkb.GPoint(Array(1.0, 2.0), hasZ = false, hasM = false),
      Wkb.GCircularString(Array(Array(0.0, 0.0), Array(1.0, 1.0), Array(2.0, 0.0)),
        hasZ = false, hasM = false)), hasZ = false, hasM = false)
    val out = Linearize.linearize(coll, 5.0).asInstanceOf[Wkb.GCollection]
    assert(out.geoms(0).isInstanceOf[Wkb.GPoint])
    assert(out.geoms(1).isInstanceOf[Wkb.GLineString])
    // and the WKB round trip keeps the collection type
    assert(GeomType.ofBytes(Wkb.write(out)) == "GeometryCollection")
  }

  test("collinear arc degrades to a straight segment") {
    val collinear = Wkb.GCircularString(
      Array(Array(0.0, 0.0), Array(1.0, 1.0), Array(2.0, 2.0)), hasZ = false, hasM = false)
    val out = Linearize.linearize(collinear, 5.0).asInstanceOf[Wkb.GLineString]
    assert(out.pts.length == 3)
  }

  test("full circle (start == end) produces a closed dense ring") {
    // circle of radius 1 around origin: start (1,0), mid (-1,0), end (1,0)
    val circ = Wkb.GCircularString(
      Array(Array(1.0, 0.0), Array(-1.0, 0.0), Array(1.0, 0.0)), hasZ = false, hasM = false)
    val out = Linearize.linearize(circ, 5.0).asInstanceOf[Wkb.GLineString]
    assert(java.util.Arrays.equals(out.pts.head, out.pts.last))
    assert(out.pts.length >= 360 / 5)
    out.pts.foreach(p => assert(math.abs(math.hypot(p(0), p(1)) - 1.0) < 1e-9))
  }
}
