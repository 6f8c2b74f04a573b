package graft.geo

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spatial grid partitioning — the scale primitive for geodata at
  * 100 TB: assign every geometry to a fixed-size grid cell derived
  * from its envelope, so a spatial join becomes a plain equi-join on
  * (cell_x, cell_y) with Catalyst-planned shuffles, and spatial
  * locality becomes bucketable/partitionable like any other key. The
  * reference's geodata flows (kartverket geometries → PostGIS) need
  * exactly this before any geometry ⋈ geometry at scale — comparing
  * envelopes per pair is quadratic; grid cells confine candidates to
  * same-cell (plus neighbor-cell, via the caller enumerating offsets)
  * groups.
  *
  * Assignment is scan-local (a closure over the in-repo WKB reader —
  * no shuffle, no external geo library); unparsable WKB yields null
  * cells and survives, the repo's standard null contract.
  */
object GeoGrid {

  /** Envelope (minX, minY, maxX, maxY) over every vertex of the
    * geometry, curved segments' control points included (a safe
    * bound: the true arc may bulge past the chord but is contained by
    * the control polygon's circle only approximately — for gridding,
    * callers pick cells ≥ the max arc bulge, the standard slack). */
  def envelope(g: Wkb.Geom): (Double, Double, Double, Double) = {
    var minX = Double.PositiveInfinity; var minY = Double.PositiveInfinity
    var maxX = Double.NegativeInfinity; var maxY = Double.NegativeInfinity
    def pt(c: Array[Double]): Unit = {
      if (c(0) < minX) minX = c(0); if (c(0) > maxX) maxX = c(0)
      if (c(1) < minY) minY = c(1); if (c(1) > maxY) maxY = c(1)
    }
    def walk(g: Wkb.Geom): Unit = g match {
      case Wkb.GPoint(c, _, _)           => pt(c)
      case Wkb.GLineString(ps, _, _)     => ps.foreach(pt)
      case Wkb.GPolygon(rs, _, _)        => rs.foreach(_.foreach(pt))
      case Wkb.GMultiPoint(gs, _, _)     => gs.foreach(walk)
      case Wkb.GMultiLineString(gs, _, _) => gs.foreach(walk)
      case Wkb.GMultiPolygon(gs, _, _)   => gs.foreach(walk)
      case Wkb.GCollection(gs, _, _)     => gs.foreach(walk)
      case Wkb.GCircularString(ps, _, _) => ps.foreach(pt)
      case Wkb.GCompoundCurve(ss, _, _)  => ss.foreach(walk)
      case Wkb.GCurvePolygon(rs, _, _)   => rs.foreach(walk)
      case Wkb.GMultiCurve(gs, _, _)     => gs.foreach(walk)
      case Wkb.GMultiSurface(gs, _, _)   => gs.foreach(walk)
    }
    walk(g)
    (minX, minY, maxX, maxY)
  }

  /** Grid cell of the envelope CENTER: `floor(center / cellSize)` per
    * axis. Center of a point is the point itself, so point corpora
    * grid with zero float slack beyond the division both engines
    * replay identically. */
  def cellOf(g: Wkb.Geom, cellSize: Double): (Long, Long) = {
    val (minX, minY, maxX, maxY) = envelope(g)
    (math.floor(((minX + maxX) / 2.0) / cellSize).toLong,
      math.floor(((minY + maxY) / 2.0) / cellSize).toLong)
  }

  /** Adds nullable `cell_x`, `cell_y` columns for the WKB column —
    * scan-local over the in-repo reader; unparsable WKB → null cells,
    * the row survives. */
  def gridCells(df: DataFrame, wkbCol: Column, cellSize: Double): DataFrame = {
    require(cellSize > 0.0, "cellSize must be positive")
    val cellUdf = udf { (bytes: Array[Byte]) =>
      Option(bytes).flatMap(Wkb.read).map(cellOf(_, cellSize))
    }
    df.withColumn("__cell", cellUdf(wkbCol))
      .withColumn("cell_x", col("__cell._1"))
      .withColumn("cell_y", col("__cell._2"))
      .drop("__cell")
  }
}
