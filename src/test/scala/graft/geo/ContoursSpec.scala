package graft.geo

import org.scalatest.funsuite.AnyFunSuite

import GeoTiff.GeoTransform

/** Contour generation over synthesized rasters with analytically known
  * results (FIXTURES.md §2: tiny single-band float32 TIFFs written by
  * test code). */
class ContoursSpec extends AnyFunSuite {

  /** 16×16 ramp: Z(row, col) = row. */
  private def rampTiff: Array[Byte] = {
    val vals = Array.tabulate(16 * 16)(i => (i / 16).toFloat)
    GeoTiff.writeFloat32(16, 16, vals)
  }

  /** 17×17 Chebyshev cone peaking at 20 in the center. */
  private def coneTiff: Array[Byte] = {
    val vals = Array.tabulate(17 * 17) { i =>
      val r = i / 17; val c = i % 17
      (20 - 2 * math.max(math.abs(r - 8), math.abs(c - 8))).toFloat
    }
    GeoTiff.writeFloat32(17, 17, vals)
  }

  test("GeoTiff roundtrip: dimensions, values, geotransform") {
    val gt = GeoTransform(originX = 1000.0, originY = 2000.0, pixelW = 10.0, pixelH = 10.0)
    val bytes = GeoTiff.writeFloat32(4, 3, Array.tabulate(12)(_.toFloat), gt)
    val r = GeoTiff.read(bytes).get
    assert(r.width == 4 && r.height == 3)
    assert(r.values.toSeq == (0 until 12).map(_.toFloat))
    assert(r.transform == gt)
    assert(r.transform.x(0.5) == 1005.0)
    assert(r.transform.y(0.5) == 1995.0)
  }

  test("GeoTiff.read rejects non-TIFF bytes") {
    assert(GeoTiff.read(Array[Byte](1, 2, 3)) == None)
    assert(GeoTiff.read("not a tiff at all".getBytes) == None)
    assert(GeoTiff.read(null) == None)
  }

  test("ramp raster: one open horizontal polyline per level") {
    val r = GeoTiff.read(rampTiff).get
    // interval 2.5, base 0 → levels 2.5, 5, 7.5, 10, 12.5 inside (0, 15)
    val lines = Contours.contourLines(r, 2.5, 0.0)
    assert(lines.size == 5)
    lines.foreach { line =>
      assert(line.length == 16) // 15 cells → 16 chained vertices
      val ys = line.map(_(1)).distinct
      assert(ys.size == 1, "contour of a pure ramp is horizontal")
    }
    // level 2.5 sits at row 2.5 → pixel-center y = -(2.5 + 0.5)  ... identity
    // transform: y(row) = -(row + 0.5); z=row crosses 2.5 between rows 2,3
    val expectedYs = Seq(2.5, 5.0, 7.5, 10.0, 12.5).map(l => -(l + 0.5))
    assert(lines.map(_(0)(1)).sorted.toSeq == expectedYs.sorted)
  }

  test("cone raster: closed square rings, one per level") {
    val r = GeoTiff.read(coneTiff).get
    // range (4, 20); base 0.5, interval 5 → levels 5.5, 10.5, 15.5
    val lines = Contours.contourLines(r, 5.0, 0.5)
    assert(lines.size == 3)
    lines.foreach { ring =>
      assert(ring.length >= 8)
      assert(ring.head.toSeq == ring.last.toSeq, "cone contours are closed rings")
    }
  }

  test("generateContoursWkb: MultiLineString WKB with the right line count") {
    val wkb = Contours.generateContoursWkb(rampTiff, 2.5, 0.0)
    assert(wkb != null)
    assert(GeomType.ofBytes(wkb) == "MultiLineString")
    val g = Wkb.read(wkb).get.asInstanceOf[Wkb.GMultiLineString]
    assert(g.geoms.length == 5)
  }

  test("null contract: empty/garbage/flat rasters → null (udf_tools.py:129,198-204)") {
    assert(Contours.generateContoursWkb(null, 10, 0) == null)
    assert(Contours.generateContoursWkb(Array.emptyByteArray, 10, 0) == null)
    assert(Contours.generateContoursWkb("garbage".getBytes, 10, 0) == null)
    // constant raster has no contours
    val flat = GeoTiff.writeFloat32(8, 8, Array.fill(64)(5.0f))
    assert(Contours.generateContoursWkb(flat, 10, 0) == null)
  }

  test("property: ramp contour count equals levels strictly inside the range") {
    // deterministic sweep over slopes/intervals/bases
    for {
      rows <- Seq(8, 16)
      slope <- Seq(0.5, 1.0, 3.0)
      interval <- Seq(0.7, 2.0, 5.0)
      base <- Seq(0.0, 0.3)
    } {
      val vals = Array.tabulate(rows * 8)(i => ((i / 8) * slope).toFloat)
      val r = GeoTiff.read(GeoTiff.writeFloat32(8, rows, vals)).get
      val minV = 0.0
      val maxV = (rows - 1) * slope
      val kMin = math.ceil((minV - base) / interval).toLong
      val kMax = math.floor((maxV - base) / interval).toLong
      val expected = (kMin to kMax).map(k => base + k * interval)
        .count(l => l > minV && l < maxV)
      val got = Contours.contourLines(r, interval, base).size
      assert(got == expected,
        s"rows=$rows slope=$slope interval=$interval base=$base")
    }
  }

  test("geotransform carries into contour coordinates") {
    val gt = GeoTransform(originX = 100.0, originY = 500.0, pixelW = 2.0, pixelH = 2.0)
    val vals = Array.tabulate(8 * 8)(i => (i / 8).toFloat)
    val r = GeoTiff.read(GeoTiff.writeFloat32(8, 8, vals, gt)).get
    val lines = Contours.contourLines(r, 3.0, 0.0) // levels 3, 6
    assert(lines.size == 2)
    // level 3 crosses at row 3 → y = 500 − (3 + 0.5)·2 = 493
    assert(lines.exists(_(0)(1) == 493.0))
    lines.foreach(_.foreach { p =>
      assert(p(0) >= 100.0 && p(0) <= 100.0 + 16.0)
    })
  }
}
