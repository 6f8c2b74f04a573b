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
    * on non-finite coordinates — the caller maps that to the
    * null/unscorable contract. The value is EXACT for every
    * representable ring: terms run through a Long fast path and fall
    * back to BigInt accumulation when an INTERMEDIATE product
    * overflows (a wide ring far from its min corner can overflow a
    * single cross term while its true area is still tiny — transient
    * overflow must not make a representable area unscorable). */
  private def ringShoelace2(ring: Array[Array[Double]]): BigInt = {
    val n = ring.length
    if (n < 3) return BigInt(0)
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
    // translated coordinates are non-negative and ≤ the ring extent;
    // MaxCoord keeps them < 2^62 so subtractExact cannot overflow
    val closed = xs(0) == xs(n - 1) && ys(0) == ys(n - 1)
    val last = if (closed) n - 1 else n
    def bigSum: BigInt = {
      var s = BigInt(0)
      var j = 0
      while (j < last) {
        val k = (j + 1) % n
        val x0 = xs(j) - minX; val y0 = ys(j) - minY
        val x1 = xs(k) - minX; val y1 = ys(k) - minY
        s += BigInt(x0) * y1 - BigInt(x1) * y0
        j += 1
      }
      s
    }
    try {
      var s = 0L
      var j = 0
      while (j < last) {
        val k = (j + 1) % n
        val x0 = xs(j) - minX; val y0 = ys(j) - minY
        val x1 = xs(k) - minX; val y1 = ys(k) - minY
        s = Math.addExact(s,
          Math.subtractExact(Math.multiplyExact(x0, y1), Math.multiplyExact(x1, y0)))
        j += 1
      }
      BigInt(s)
    } catch { case _: ArithmeticException => bigSum }
  }

  /** Twice the total area over (multi)polygon parts as an exact
    * BigInt: per part, |shoelace(exterior)| minus Σ|shoelace(hole)|
    * using the OGC/WKB POSITIONAL contract — ring 0 is the exterior,
    * later rings are holes — rather than winding order, which WKB
    * producers do not reliably normalize (a hole wound the same way
    * as its shell is legal bytes and must still subtract). Fully
    * orientation-independent as a result. None on bad coordinates or
    * holes outweighing their shell (the unscorable contract — that
    * geometry is invalid, not zero-area). Never None for magnitude:
    * the BigInt value is total. */
  private[geo] def polyArea2Big(parts: Array[Wkb.GPolygon]): Option[BigInt] =
    try {
      var total = BigInt(0)
      parts.foreach { p =>
        var s = BigInt(0)
        var i = 0
        p.rings.foreach { r =>
          val a = ringShoelace2(r).abs
          s = if (i == 0) a else s - a
          i += 1
        }
        if (s.signum < 0) throw new ArithmeticException("holes outweigh the exterior ring")
        total += s
      }
      Some(total)
    } catch { case _: ArithmeticException => None }

  /** [[polyArea2Big]] clamped to the Long-valued column contract:
    * None exactly when the geometry is unscorable OR the FINAL
    * doubled area exceeds Long range — the same scorability rule as
    * the rational clip path, so self-intersection always agrees with
    * the polygon's own area. */
  private[geo] def polyArea2Fp(parts: Array[Wkb.GPolygon]): Option[Long] =
    polyArea2Big(parts).filter(_ <= BigInt(Long.MaxValue)).map(_.toLong)

  // ---------- intersection area (Sutherland–Hodgman, exact rational) ----------

  /** Homogeneous rational point (x/w, y/w) with w > 0 — clip-edge
    * intersections are rational even over integer inputs, and BigInt
    * homogeneous coordinates keep the whole clip EXACT (a double
    * evaluation would drift in the last ulp and break oracle replay).
    * gcd-reduced after every intersection to bound coefficient
    * growth. */
  private final case class HPt(x: BigInt, y: BigInt, w: BigInt) {
    def reduced: HPt = {
      val g = x.gcd(y).gcd(w)
      if (g > 1) HPt(x / g, y / g, w / g) else this
    }
  }

  /** Ring vertices floored to micro-unit Longs (the q82 arithmetic),
    * closing duplicate dropped. Throws on non-finite/out-of-range
    * coordinates — callers map that to the unscorable contract. */
  private def fpRing(r: Array[Array[Double]]): Array[(Long, Long)] = {
    val pts = r.map { c =>
      val x = c(0); val y = c(1)
      if (!java.lang.Double.isFinite(x) || !java.lang.Double.isFinite(y) ||
        math.abs(x) > GeoGrid.MaxCoord || math.abs(y) > GeoGrid.MaxCoord)
        throw new ArithmeticException("non-finite or out-of-range coordinate")
      (math.floor(x * 1e6).toLong, math.floor(y * 1e6).toLong)
    }
    if (pts.length >= 2 && pts.head == pts.last) pts.dropRight(1) else pts
  }

  private def signedArea2(ring: Array[(Long, Long)]): BigInt = {
    var s = BigInt(0)
    var j = 0
    while (j < ring.length) {
      val (x0, y0) = ring(j)
      val (x1, y1) = ring((j + 1) % ring.length)
      s += BigInt(x0) * y1 - BigInt(x1) * y0
      j += 1
    }
    s
  }

  /** Convex (allowing collinear runs): no two consecutive-edge cross
    * products with opposite signs. */
  private def isConvex(ring: Array[(Long, Long)]): Boolean = {
    var pos = false; var neg = false
    var j = 0
    val n = ring.length
    while (j < n) {
      val (ax, ay) = ring(j)
      val (bx, by) = ring((j + 1) % n)
      val (cx, cy) = ring((j + 2) % n)
      val cr = BigInt(bx - ax) * (cy - by) - BigInt(by - ay) * (cx - bx)
      if (cr.signum > 0) pos = true
      if (cr.signum < 0) neg = true
      j += 1
    }
    !(pos && neg)
  }

  /** Which side of the directed clip edge c1→c2 (CCW ⇒ inside is
    * left, sign ≥ 0). */
  private def side(p: HPt, c1: (Long, Long), c2: (Long, Long)): Int =
    (BigInt(c2._1 - c1._1) * (p.y - BigInt(c1._2) * p.w) -
      BigInt(c2._2 - c1._2) * (p.x - BigInt(c1._1) * p.w)).signum

  /** Exact intersection of segment-line p–q with the clip line c1–c2
    * via homogeneous line cross products; callers only invoke it when
    * the endpoints sit on opposite sides, so the lines are never
    * parallel. */
  private def intersect(p: HPt, q: HPt,
      c1: (Long, Long), c2: (Long, Long)): HPt = {
    val a = BigInt(c1._2 - c2._2)
    val b = BigInt(c2._1 - c1._1)
    val c = BigInt(c1._1) * c2._2 - BigInt(c2._1) * c1._2
    val m1 = p.y * q.w - p.w * q.y
    val m2 = p.w * q.x - p.x * q.w
    val m3 = p.x * q.y - p.y * q.x
    val x = b * m3 - c * m2
    val y = c * m1 - a * m3
    val w = a * m2 - b * m1
    (if (w.signum < 0) HPt(-x, -y, -w) else HPt(x, y, w)).reduced
  }

  private def clipEdge(in: Array[HPt],
      c1: (Long, Long), c2: (Long, Long)): Array[HPt] = {
    if (in.isEmpty) return in
    val buf = scala.collection.mutable.ArrayBuffer.empty[HPt]
    var j = 0
    while (j < in.length) {
      val cur = in(j)
      val prev = in((j + in.length - 1) % in.length)
      val cs = side(cur, c1, c2)
      val ps = side(prev, c1, c2)
      if (cs >= 0) {
        if (ps < 0) buf += intersect(prev, cur, c1, c2)
        buf += cur
      } else if (ps >= 0) buf += intersect(prev, cur, c1, c2)
      j += 1
    }
    buf.toArray
  }

  /** TWICE the intersection area of `subj` clipped by the CONVEX
    * ring `clip`, as an EXACT non-negative rational `num/den` in
    * micro-unit fp² — rational Sutherland–Hodgman, gcd-reduced.
    * Subject concavity is fine: S-H's degenerate bridge edges along
    * the clip boundary are zero-area. Kept rational (not floored) so
    * triangulated concave clips can sum per-triangle areas EXACTLY
    * and floor once at the end — per-triangle floors would undershoot
    * the true total. */
  private def clipArea2Rat(subj: Array[(Long, Long)],
      clip0: Array[(Long, Long)]): (BigInt, BigInt) = {
    val clip = if (signedArea2(clip0).signum >= 0) clip0 else clip0.reverse
    var out = subj.map { case (x, y) => HPt(BigInt(x), BigInt(y), BigInt(1)) }
    var j = 0
    while (j < clip.length && out.nonEmpty) {
      out = clipEdge(out, clip(j), clip((j + 1) % clip.length))
      j += 1
    }
    if (out.length < 3) return (BigInt(0), BigInt(1))
    var num = BigInt(0); var den = BigInt(1)
    var i = 0
    while (i < out.length) {
      val p = out(i); val q = out((i + 1) % out.length)
      val tn = p.x * q.y - q.x * p.y
      val td = p.w * q.w
      num = num * td + tn * den
      den = den * td
      val g = num.gcd(den)
      if (g > 1) { num /= g; den /= g }
      i += 1
    }
    if (num.signum < 0) (-num, den) else (num, den)
  }

  /** Ear-clipping triangulation of a SIMPLE ring over the exact
    * integer cross machinery: normalize to CCW, then repeatedly cut a
    * convex vertex whose CLOSED ear triangle contains no other ring
    * vertex — a vertex exactly ON the ear's boundary blocks too,
    * because a diagonal through a vertex pinches the remainder into a
    * non-simple chain and double-counts area (the L-ring's notch
    * corner sits exactly on the corner-to-corner hypotenuse — a real
    * regression this function shipped with). Zero-area (collinear)
    * ears are cut freely — they contribute nothing. Throws
    * ArithmeticException when no ear exists (a self-intersecting
    * ring — Meisters' two-ears theorem guarantees one for every
    * simple polygon), which callers map to the envelope fallback. */
  private[geo] def earTriangulate(
      ring0: Array[(Long, Long)]): Array[Array[(Long, Long)]] = {
    val ccw = if (signedArea2(ring0).signum >= 0) ring0 else ring0.reverse
    val work = scala.collection.mutable.ArrayBuffer(ccw: _*)
    val tris = scala.collection.mutable.ArrayBuffer.empty[Array[(Long, Long)]]
    def cross(a: (Long, Long), b: (Long, Long), c: (Long, Long)): BigInt =
      BigInt(b._1 - a._1) * (c._2 - b._2) - BigInt(b._2 - a._2) * (c._1 - b._1)
    def insideOrOn(p: (Long, Long), a: (Long, Long), b: (Long, Long),
        c: (Long, Long)): Boolean =
      cross(a, b, p).signum >= 0 && cross(b, c, p).signum >= 0 &&
        cross(c, a, p).signum >= 0
    while (work.length > 3) {
      val n = work.length
      var i = 0
      var cut = false
      while (i < n && !cut) {
        val a = work((i + n - 1) % n); val b = work(i); val c = work((i + 1) % n)
        val cr = cross(a, b, c)
        if (cr.signum == 0) { work.remove(i); cut = true } // degenerate ear
        else if (cr.signum > 0) {
          var blocked = false
          var j = 0
          while (j < n && !blocked) {
            val p = work(j)
            if (p != a && p != b && p != c && insideOrOn(p, a, b, c))
              blocked = true
            j += 1
          }
          if (!blocked) { tris += Array(a, b, c); work.remove(i); cut = true }
        }
        i += 1
      }
      if (!cut) throw new ArithmeticException("no ear: ring is not simple")
    }
    if (work.length == 3) tris += work.toArray
    tris.toArray
  }

  /** Floor of TWICE the intersection area of `subj` with `clip`,
    * exact for ANY pair of simple rings: a concave side is
    * ear-triangulated, and Sutherland–Hodgman only ever runs on
    * convex⋈convex pieces — the one regime where it is provably
    * exact (a concave SUBJECT's degenerate bridge edges cancel in
    * theory, but collinear subject/clip edge overlaps make that
    * cancellation fragile; partitioning sidesteps it entirely).
    * Intersection area is additive over both partitions, and the
    * per-piece rationals are summed EXACTLY before the single final
    * floor — per-piece floors would undershoot the true total. */
  private def clipArea2Big(subj: Array[(Long, Long)],
      clip: Array[(Long, Long)]): BigInt = {
    val subjParts = if (isConvex(subj)) Array(subj) else earTriangulate(subj)
    val clipParts = if (isConvex(clip)) Array(clip) else earTriangulate(clip)
    var num = BigInt(0); var den = BigInt(1)
    subjParts.foreach { sp =>
      clipParts.foreach { cp =>
        val (tn, td) = clipArea2Rat(sp, cp)
        num = num * td + tn * den
        den = den * td
        val g = num.gcd(den)
        if (g > 1) { num /= g; den /= g }
      }
    }
    num / den
  }

  /** Envelope-intersection doubled area over every vertex of every
    * part — the conservative upper-bound fallback when exact clipping
    * isn't available (multi-part or holes). */
  private def envArea2Big(pa: Array[Wkb.GPolygon],
      pb: Array[Wkb.GPolygon]): BigInt = {
    def box(ps: Array[Wkb.GPolygon]): (Long, Long, Long, Long) = {
      var x0 = Long.MaxValue; var y0 = Long.MaxValue
      var x1 = Long.MinValue; var y1 = Long.MinValue
      ps.foreach(_.rings.foreach(fpRing(_).foreach { case (x, y) =>
        if (x < x0) x0 = x; if (y < y0) y0 = y
        if (x > x1) x1 = x; if (y > y1) y1 = y
      }))
      if (x0 > x1) throw new ArithmeticException("empty polygon")
      (x0, y0, x1, y1)
    }
    val (ax0, ay0, ax1, ay1) = box(pa)
    val (bx0, by0, bx1, by1) = box(pb)
    val w = BigInt(math.min(ax1, bx1)) - math.max(ax0, bx0)
    val h = BigInt(math.min(ay1, by1)) - math.max(ay0, by0)
    if (w.signum <= 0 || h.signum <= 0) BigInt(0) else 2 * w * h
  }

  /** TWICE the intersection area of two (multi)polygons in micro-unit
    * fp² as an exact BigInt, plus an exactness flag: single-part,
    * single-ring pairs get the exact rational clip (concave sides
    * ear-triangulated, Sutherland–Hodgman over the convex pieces)
    * with `exact = true`; multi-part or holed inputs degrade to the
    * envelope-intersection upper bound with `exact = false`; so does
    * a non-simple ring that defeats triangulation. `(None, false)`
    * for unscorable inputs. */
  private[geo] def intersectionArea2Big(pa: Array[Wkb.GPolygon],
      pb: Array[Wkb.GPolygon]): (Option[BigInt], Boolean) =
    try {
      if (pa.isEmpty || pb.isEmpty) (None, false)
      else {
        val single = pa.length == 1 && pa(0).rings.length == 1 &&
          pb.length == 1 && pb(0).rings.length == 1
        if (single) {
          val ra = fpRing(pa(0).rings(0))
          val rb = fpRing(pb(0).rings(0))
          if (ra.length >= 3 && rb.length >= 3)
            try (Some(clipArea2Big(ra, rb)), true)
            catch {
              // non-simple ring: triangulation failed — envelope bound
              case _: ArithmeticException => (Some(envArea2Big(pa, pb)), false)
            }
          else (Some(envArea2Big(pa, pb)), false)
        } else (Some(envArea2Big(pa, pb)), false)
      }
    } catch { case _: ArithmeticException => (None, false) }

  /** [[intersectionArea2Big]] clamped to the Long-valued column
    * contract: None exactly when unscorable OR the FINAL doubled area
    * exceeds Long range — matching [[polyArea2Fp]]'s scorability so
    * self-intersection reproduces the polygon's own area. */
  private[geo] def intersectionArea2Fp(pa: Array[Wkb.GPolygon],
      pb: Array[Wkb.GPolygon]): (Option[Long], Boolean) = {
    val (a, exact) = intersectionArea2Big(pa, pb)
    (a.filter(_ <= BigInt(Long.MaxValue)).map(_.toLong), exact)
  }

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
