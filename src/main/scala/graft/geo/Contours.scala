package graft.geo

import scala.collection.mutable.{ArrayBuffer, HashMap}

import GeoTiff.{GeoTransform, Raster}

/** Raster → contour polylines → MultiLineString WKB — the engine's
  * equivalent of the reference's GDAL-backed `generate_contours_wkb`
  * (`udf_tools.py:127-213`): contour levels at `base + k·interval`,
  * LineString per connected polyline, all levels aggregated into one
  * MultiLineString, null on error or when no contour exists.
  *
  * Implementation is marching squares over pixel centers with linear
  * edge interpolation. Crossing points on shared cell edges are
  * computed from canonically-ordered corners, so both adjacent cells
  * produce bit-identical doubles and segment chaining can join on
  * exact coordinates.
  */
object Contours {

  /** All contour polylines of `raster` at levels base + k·interval
    * strictly inside the data range. */
  def contourLines(raster: Raster, interval: Double, base: Double)
      : Seq[Array[Array[Double]]] = {
    if (interval <= 0 || raster.width < 2 || raster.height < 2) return Seq.empty
    var min = Double.MaxValue
    var max = Double.MinValue
    raster.values.foreach { v => if (v < min) min = v; if (v > max) max = v }
    if (!(max > min)) return Seq.empty
    val kMin = math.ceil((min - base) / interval).toLong
    val kMax = math.floor((max - base) / interval).toLong
    (kMin to kMax).flatMap { k =>
      val level = base + k * interval
      if (level <= min || level >= max) Seq.empty
      else chain(levelSegments(raster, level))
    }
  }

  /** MultiLineString WKB of the contours; null when none (reference
    * `udf_tools.py:198-204`). */
  def generateContoursWkb(rasterBytes: Array[Byte], interval: Double,
      base: Double): Array[Byte] = {
    if (rasterBytes == null || rasterBytes.isEmpty) return null
    GeoTiff.read(rasterBytes) match {
      case None => null
      case Some(raster) =>
        try {
          val lines = contourLines(raster, interval, base)
          if (lines.isEmpty) null
          else Wkb.write(Wkb.GMultiLineString(
            lines.map(pts => Wkb.GLineString(pts, hasZ = false, hasM = false)).toArray,
            hasZ = false, hasM = false))
        } catch { case scala.util.control.NonFatal(_) => null }
    }
  }

  // ---------------- marching squares ----------------

  private type Pt = Array[Double]

  /** Interpolated crossing on the edge between two pixel centers;
    * corners are passed in canonical (row-major) order. */
  private def interp(r1: Int, c1: Int, v1: Double, r2: Int, c2: Int, v2: Double,
      level: Double, gt: GeoTransform): Pt = {
    val t = (level - v1) / (v2 - v1)
    Array(gt.x(c1 + 0.5 + t * (c2 - c1)), gt.y(r1 + 0.5 + t * (r2 - r1)))
  }

  private def levelSegments(raster: Raster, level: Double): ArrayBuffer[(Pt, Pt)] = {
    val segs = new ArrayBuffer[(Pt, Pt)]()
    val gt = raster.transform
    val w = raster.width
    var r = 0
    while (r < raster.height - 1) {
      var c = 0
      while (c < w - 1) {
        val tl = raster(r, c).toDouble
        val tr = raster(r, c + 1).toDouble
        val bl = raster(r + 1, c).toDouble
        val br = raster(r + 1, c + 1).toDouble
        val idx = (if (tl >= level) 8 else 0) | (if (tr >= level) 4 else 0) |
          (if (br >= level) 2 else 0) | (if (bl >= level) 1 else 0)
        if (idx != 0 && idx != 15) {
          def top = interp(r, c, tl, r, c + 1, tr, level, gt)
          def bottom = interp(r + 1, c, bl, r + 1, c + 1, br, level, gt)
          def left = interp(r, c, tl, r + 1, c, bl, level, gt)
          def right = interp(r, c + 1, tr, r + 1, c + 1, br, level, gt)
          idx match {
            case 1 | 14 => segs += ((left, bottom))
            case 2 | 13 => segs += ((bottom, right))
            case 3 | 12 => segs += ((left, right))
            case 4 | 11 => segs += ((top, right))
            case 6 | 9  => segs += ((top, bottom))
            case 7 | 8  => segs += ((left, top))
            case 5 => // saddle (TR+BL): resolve on the center average
              if ((tl + tr + bl + br) / 4.0 >= level) {
                segs += ((left, top)); segs += ((bottom, right))
              } else {
                segs += ((left, bottom)); segs += ((top, right))
              }
            case 10 => // saddle (TL+BR)
              if ((tl + tr + bl + br) / 4.0 >= level) {
                segs += ((top, right)); segs += ((left, bottom))
              } else {
                segs += ((left, top)); segs += ((bottom, right))
              }
            case _ => ()
          }
        }
        c += 1
      }
      r += 1
    }
    segs
  }

  /** Join undirected segments into maximal polylines by exact-endpoint
    * matching. */
  private def chain(segs: ArrayBuffer[(Pt, Pt)]): Seq[Array[Pt]] = {
    def key(p: Pt): (Long, Long) =
      (java.lang.Double.doubleToLongBits(p(0)), java.lang.Double.doubleToLongBits(p(1)))
    val byEndpoint = new HashMap[(Long, Long), ArrayBuffer[Int]]()
    segs.indices.foreach { i =>
      byEndpoint.getOrElseUpdate(key(segs(i)._1), new ArrayBuffer) += i
      byEndpoint.getOrElseUpdate(key(segs(i)._2), new ArrayBuffer) += i
    }
    val used = new Array[Boolean](segs.length)

    def walk(startSeg: Int, startPt: Pt): ArrayBuffer[Pt] = {
      val line = new ArrayBuffer[Pt]()
      var current = startPt
      var seg = startSeg
      line += current
      var continue = true
      while (continue) {
        used(seg) = true
        val (a, b) = segs(seg)
        val next = if (key(a) == key(current)) b else a
        line += next
        current = next
        byEndpoint.getOrElse(key(current), ArrayBuffer.empty)
          .find(!used(_)) match {
          case Some(s) => seg = s
          case None    => continue = false
        }
      }
      line
    }

    val out = new ArrayBuffer[Array[Pt]]()
    // open polylines first: start from endpoints of degree 1
    segs.indices.foreach { i =>
      if (!used(i)) {
        val (a, b) = segs(i)
        val startPt =
          if (byEndpoint(key(a)).count(!used(_)) == 1) Some(a)
          else if (byEndpoint(key(b)).count(!used(_)) == 1) Some(b)
          else None
        startPt.foreach(p => out += walk(i, p).toArray)
      }
    }
    // remaining are closed rings
    segs.indices.foreach { i =>
      if (!used(i)) out += walk(i, segs(i)._1).toArray
    }
    out.toSeq
  }
}
