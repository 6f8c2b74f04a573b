package graft.geo

import scala.collection.mutable.ArrayBuffer

import Wkb._

/** Curved→linear geometry conversion — the engine's equivalent of the
  * reference's `curved_to_linear_wkb`
  * (`/root/reference/src/dask_felleskomponenter/udfs/udf_conversions.py:12-59`,
  * which delegates to OGR `GetLinearGeometry`). No GDAL offline, so the
  * circular-arc sampling is implemented directly:
  *
  *  - each arc is the circle through consecutive point triples of a
  *    CircularString; vertices are emitted so no segment subtends more
  *    than `maxAngleStepDegrees` (0.0 → 4°, OGR's default);
  *  - arc endpoints are preserved exactly (no float drift at joins);
  *  - collinear / degenerate triples degrade to straight segments;
  *  - Z/M values interpolate linearly along the arc parameter;
  *  - type mapping per the reference's tested contract
  *    (`udfs/tests/wkb_registration_and_sql_tests.py:173-188`):
  *    CircularString→LineString, CompoundCurve→LineString,
  *    CurvePolygon→Polygon, MultiCurve→MultiLineString,
  *    MultiSurface→MultiPolygon; already-linear types pass through.
  */
object Linearize {

  val DefaultMaxAngleStepDegrees = 4.0

  /** Null-safe byte-level entry point (the UDF body): EWKB SRID is
    * stripped (reference `udf_conversions.py:24-44`), output is ISO
    * little-endian WKB, and any parse failure returns null
    * (`udf_conversions.py:58-59`). */
  def curvedToLinearWkb(wkb: Array[Byte], maxAngleStepDegrees: Double): Array[Byte] = {
    if (wkb == null) return null
    Wkb.read(Wkb.stripSrid(wkb)) match {
      case Some(g) =>
        try Wkb.write(linearize(g, effectiveStep(maxAngleStepDegrees)))
        catch { case scala.util.control.NonFatal(_) => null }
      case None => null
    }
  }

  def effectiveStep(deg: Double): Double =
    if (deg <= 0.0 || deg.isNaN) DefaultMaxAngleStepDegrees else deg

  /** Structural linearization over the geometry AST. */
  def linearize(g: Geom, stepDeg: Double): Geom = g match {
    case c: GCircularString => GLineString(arcPoints(c.pts, dimsOf(c), stepDeg), c.hasZ, c.hasM)
    case c: GCompoundCurve  => GLineString(compoundPoints(c, stepDeg), c.hasZ, c.hasM)
    case c: GCurvePolygon =>
      GPolygon(c.rings.map(r => ringPoints(r, stepDeg)), c.hasZ, c.hasM)
    case m: GMultiCurve =>
      GMultiLineString(m.geoms.map(toLineString(_, stepDeg)), m.hasZ, m.hasM)
    case m: GMultiSurface =>
      GMultiPolygon(m.geoms.map(toPolygon(_, stepDeg)), m.hasZ, m.hasM)
    case c: GCollection => GCollection(c.geoms.map(linearize(_, stepDeg)), c.hasZ, c.hasM)
    case linear => linear
  }

  private def toLineString(g: Geom, stepDeg: Double): GLineString =
    linearize(g, stepDeg) match {
      case l: GLineString => l
      case other => throw new IllegalArgumentException(
        s"expected curve in MultiCurve, got ${other.getClass.getSimpleName}")
    }

  private def toPolygon(g: Geom, stepDeg: Double): GPolygon =
    linearize(g, stepDeg) match {
      case p: GPolygon => p
      case other => throw new IllegalArgumentException(
        s"expected surface in MultiSurface, got ${other.getClass.getSimpleName}")
    }

  private def ringPoints(ring: Geom, stepDeg: Double): Array[Array[Double]] = ring match {
    case l: GLineString     => l.pts
    case c: GCircularString => arcPoints(c.pts, dimsOf(c), stepDeg)
    case c: GCompoundCurve  => compoundPoints(c, stepDeg)
    case other => throw new IllegalArgumentException(
      s"unsupported CurvePolygon ring: ${other.getClass.getSimpleName}")
  }

  /** Chain segment point runs end-to-end, dropping duplicated joints. */
  private def compoundPoints(c: GCompoundCurve, stepDeg: Double): Array[Array[Double]] = {
    val out = new ArrayBuffer[Array[Double]]()
    c.segs.foreach { seg =>
      val pts = seg match {
        case l: GLineString     => l.pts
        case a: GCircularString => arcPoints(a.pts, dimsOf(a), stepDeg)
        case other => throw new IllegalArgumentException(
          s"unsupported CompoundCurve segment: ${other.getClass.getSimpleName}")
      }
      val start = if (out.nonEmpty && pts.nonEmpty &&
        java.util.Arrays.equals(out.last, pts.head)) 1 else 0
      var i = start
      while (i < pts.length) { out += pts(i); i += 1 }
    }
    out.toArray
  }

  /** Sample a CircularString's arcs (triples 0-1-2, 2-3-4, …). */
  private[geo] def arcPoints(pts: Array[Array[Double]], dims: Int,
      stepDeg: Double): Array[Array[Double]] = {
    if (pts.length < 3) return pts
    val out = new ArrayBuffer[Array[Double]]()
    out += pts(0)
    var i = 0
    while (i + 2 < pts.length) {
      sampleArc(pts(i), pts(i + 1), pts(i + 2), dims, stepDeg, out)
      i += 2
    }
    out.toArray
  }

  /** Append the samples of one arc (p0→p1→p2), excluding p0 (already
    * emitted), ending with exactly p2. */
  private def sampleArc(p0: Array[Double], p1: Array[Double], p2: Array[Double],
      dims: Int, stepDeg: Double, out: ArrayBuffer[Array[Double]]): Unit = {
    val ax = p0(0); val ay = p0(1)
    val bx = p1(0); val by = p1(1)
    val cx = p2(0); val cy = p2(1)
    val twoPi = 2.0 * math.Pi
    val closed = ax == cx && ay == cy
    var ux = 0.0; var uy = 0.0
    if (closed) {
      // SQL-MM full-circle convention: start==end, middle point is the
      // antipode, so p0–p1 is a diameter.
      ux = (ax + bx) / 2.0; uy = (ay + by) / 2.0
      if (ux == ax && uy == ay) { out += p1; out += p2; return } // zero radius
    } else {
      // Perpendicular-bisector intersection; d=0 → collinear → straight.
      val d = 2.0 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
      if (math.abs(d) < 1e-12) { out += p1; out += p2; return }
      val a2 = ax * ax + ay * ay
      val b2 = bx * bx + by * by
      val c2 = cx * cx + cy * cy
      ux = (a2 * (by - cy) + b2 * (cy - ay) + c2 * (ay - by)) / d
      uy = (a2 * (cx - bx) + b2 * (ax - cx) + c2 * (bx - ax)) / d
    }
    val r = math.hypot(ax - ux, ay - uy)
    val a0 = math.atan2(ay - uy, ax - ux)
    val a1 = math.atan2(by - uy, bx - ux)
    val aEnd = math.atan2(cy - uy, cx - ux)
    def ccwFrom(from: Double, to: Double): Double = {
      val delta = (to - from) % twoPi
      if (delta < 0) delta + twoPi else delta
    }
    val sweep =
      if (closed) twoPi // full circle; every angle incl. a1 is covered
      else {
        val dEnd = ccwFrom(a0, aEnd)
        val dMid = ccwFrom(a0, a1)
        if (dMid <= dEnd) dEnd else dEnd - twoPi // ccw iff p1 lies on the ccw path
      }
    val nSeg = math.max(1, math.ceil(math.abs(math.toDegrees(sweep)) / stepDeg).toInt)
    var k = 1
    while (k <= nSeg) {
      if (k == nSeg) out += p2 // exact endpoint, no trig drift
      else {
        val ang = a0 + sweep * k / nSeg
        val pt = new Array[Double](dims)
        pt(0) = ux + r * math.cos(ang)
        pt(1) = uy + r * math.sin(ang)
        var j = 2 // Z/M: linear along the arc parameter
        while (j < dims) { pt(j) = p0(j) + (p2(j) - p0(j)) * k / nSeg; j += 1 }
        out += pt
      }
      k += 1
    }
  }

  private def dimsOf(g: Geom): Int =
    2 + (if (g.hasZ) 1 else 0) + (if (g.hasM) 1 else 0)
}
