package graft.geo

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-geometry shape statistics in oracle-exact integer arithmetic —
  * the st_area-class introspection a polygon-heavy platform reports
  * over every layer it manages (the reference's platform syncs polygon
  * layers to PostGIS, `sync_df_to_pgdb.py:198-202`; ring/vertex/area
  * statistics are the standard governance metrics over such layers).
  *
  * Area comes from the shoelace formula evaluated on `floor(c·10⁶)`
  * micro-unit Longs, so the result is a deterministic integer both
  * engines replay bit-for-bit — a double shoelace would drift in the
  * last ulp against any independently-ordered reference computation.
  * Scale shape: one scan-local projection over the WKB bytes, zero
  * shuffle; the scan's cost is the operator's cost.
  */
object GeoStats {

  /** Twice the SIGNED shoelace area of one ring in micro-unit fp²
    * (CCW positive), after translating the ring to its own min corner
    * — shoelace is translation-invariant over integers, and the
    * translation keeps products bounded by the ring's EXTENT rather
    * than its distance from the origin. Works on closed (WKB
    * contract) and unclosed rings alike. Throws ArithmeticException
    * on non-finite coordinates or Long overflow — the caller maps
    * that to the null/unscorable contract; the decision is exact
    * (addExact/multiplyExact), not estimated from a bound. */
  private def ringShoelace2Fp(ring: Array[Array[Double]]): Long = {
    val n = ring.length
    if (n < 3) return 0L
    val xs = new Array[Long](n)
    val ys = new Array[Long](n)
    var minX = Long.MaxValue
    var minY = Long.MaxValue
    var i = 0
    while (i < n) {
      val x = ring(i)(0); val y = ring(i)(1)
      if (!java.lang.Double.isFinite(x) || !java.lang.Double.isFinite(y) ||
        math.abs(x) > GeoGrid.MaxCoord || math.abs(y) > GeoGrid.MaxCoord)
        throw new ArithmeticException("non-finite or out-of-range coordinate")
      xs(i) = math.floor(x * 1e6).toLong
      ys(i) = math.floor(y * 1e6).toLong
      if (xs(i) < minX) minX = xs(i)
      if (ys(i) < minY) minY = ys(i)
      i += 1
    }
    var s = 0L
    def term(i: Int, j: Int): Unit = {
      val x0 = Math.subtractExact(xs(i), minX)
      val y0 = Math.subtractExact(ys(i), minY)
      val x1 = Math.subtractExact(xs(j), minX)
      val y1 = Math.subtractExact(ys(j), minY)
      s = Math.addExact(s,
        Math.subtractExact(Math.multiplyExact(x0, y1), Math.multiplyExact(x1, y0)))
    }
    i = 0
    while (i < n - 1) { term(i, i + 1); i += 1 }
    // a closed ring (WKB contract: first == last) has already cycled —
    // the duplicate endpoint's edge to itself contributed zero and the
    // edge into it closed the loop; an unclosed ring wraps explicitly
    if (xs(0) != xs(n - 1) || ys(0) != ys(n - 1)) term(n - 1, 0)
    s
  }

  /** Twice the total area over (multi)polygon parts: per part,
    * |shoelace(exterior)| minus Σ|shoelace(hole)| using the OGC/WKB
    * POSITIONAL contract — ring 0 is the exterior, later rings are
    * holes — rather than winding order, which WKB producers do not
    * reliably normalize (a hole wound the same way as its shell is
    * legal bytes and must still subtract). Fully
    * orientation-independent as a result. None on overflow, bad
    * coordinates, or holes outweighing their shell (the unscorable
    * contract — that geometry is invalid, not zero-area). */
  private[geo] def polyArea2Fp(parts: Array[Wkb.GPolygon]): Option[Long] =
    try {
      var total = 0L
      parts.foreach { p =>
        var s = 0L
        var i = 0
        p.rings.foreach { r =>
          val a = Math.absExact(ringShoelace2Fp(r))
          s = if (i == 0) a else Math.subtractExact(s, a)
          i += 1
        }
        if (s < 0L) throw new ArithmeticException("holes outweigh the exterior ring")
        total = Math.addExact(total, s)
      }
      Some(total)
    } catch { case _: ArithmeticException => None }

  /** Shape statistics per row: `(poly_id, n_rings, n_vertices,
    * area2_fp2)` where area2_fp2 is TWICE the area in squared
    * micro-units (keeping it doubled avoids a halving that would
    * round). Curved surfaces participate via their linearization
    * (the [[GeoGrid]] contract); unparsable WKB and non-polygon
    * geometries yield all-null stats and the row survives; a polygon
    * whose area arithmetic would overflow yields null area but real
    * ring/vertex counts. */
  def shapeStats(df: DataFrame, idCol: Column, wkbCol: Column): DataFrame = {
    val statsUdf = udf { (bytes: Array[Byte]) =>
      Option(bytes).flatMap(Wkb.read).map(GeoGrid.linearized)
        .map(GeoGrid.polysIn).filter(_.nonEmpty).map { parts =>
          (parts.map(_.rings.length).sum.toLong,
            parts.map(_.rings.map(_.length).sum).sum.toLong,
            polyArea2Fp(parts))
        }
    }
    df.select(idCol.as("poly_id"), statsUdf(wkbCol).as("s"))
      .select(col("poly_id"), col("s._1").as("n_rings"),
        col("s._2").as("n_vertices"), col("s._3").as("area2_fp2"))
  }
}
