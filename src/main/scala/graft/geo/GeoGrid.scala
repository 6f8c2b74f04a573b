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
    * replay identically.
    *
    * None for geometries with no finite envelope — empty geometries
    * (zero-vertex linestrings, POINT EMPTY's NaN coordinates) must NOT
    * grid: `math.floor(NaN).toLong` is 0, so without the guard every
    * empty geometry would silently land in cell (0,0) and pair with
    * real geometries near the origin. */
  /** Largest |coordinate| the micro-unit fixed point can hold:
    * `floor(c·10⁶)` must stay inside Long or comparisons silently
    * wrap. Geometries beyond it are unscorable → excluded, the same
    * contract as empty geometries. */
  val MaxCoord = 9.0e12

  /** Finite envelope center, or None for empty/NaN/out-of-range
    * geometries — the ONE owner of the unscorable-geometry contract
    * every grid entry point shares. */
  private[geo] def finiteCenter(g: Wkb.Geom): Option[(Double, Double)] = {
    val (minX, minY, maxX, maxY) = envelope(g)
    val cx = (minX + maxX) / 2.0
    val cy = (minY + maxY) / 2.0
    if (java.lang.Double.isFinite(cx) && java.lang.Double.isFinite(cy) &&
      math.abs(cx) <= MaxCoord && math.abs(cy) <= MaxCoord)
      Some((cx, cy))
    else None
  }

  def cellOf(g: Wkb.Geom, cellSize: Double): Option[(Long, Long)] =
    finiteCenter(g).map { case (cx, cy) =>
      (math.floor(cx / cellSize).toLong, math.floor(cy / cellSize).toLong)
    }

  /** Even-odd (PNPOLY) point-in-polygon test over every ring — holes
    * flip the parity back out, which is exactly the even-odd contract.
    * The closing vertex's zero-length edge never crosses the ray
    * (its y-interval is empty), so closed rings need no special case.
    * Points exactly ON an edge get an arbitrary but deterministic
    * side — callers with boundary semantics quantize away from edges
    * (as the q80 corpus does by construction). */
  def containsPoint(poly: Wkb.GPolygon, px: Double, py: Double): Boolean = {
    var inside = false
    poly.rings.foreach { ring =>
      var j = ring.length - 1
      var i = 0
      while (i < ring.length) {
        val xi = ring(i)(0); val yi = ring(i)(1)
        val xj = ring(j)(0); val yj = ring(j)(1)
        if ((yi > py) != (yj > py) &&
          px < (xj - xi) * (py - yi) / (yj - yi) + xi) inside = !inside
        j = i; i += 1
      }
    }
    inside
  }

  /** Largest supported cellSize/maxDist: fixed-point squared distances
    * on adjacent-cell candidates reach `(2·cellSize·10⁶)²`, which must
    * stay inside Long — beyond this bound results would be silently
    * wrong (wrapped), so the operators refuse instead. */
  val MaxCellSize = 1500.0

  /** Adds nullable `cell_x`, `cell_y` columns for the WKB column —
    * scan-local over the in-repo reader; unparsable WKB and empty
    * geometries → null cells, the row survives. Refuses to clobber
    * existing `cell_x`/`cell_y` columns. */
  def gridCells(df: DataFrame, wkbCol: Column, cellSize: Double): DataFrame = {
    require(cellSize > 0.0, "cellSize must be positive")
    require(!df.columns.contains("cell_x") && !df.columns.contains("cell_y"),
      "input already has cell_x/cell_y — rename them before re-gridding")
    val tmp = graft.Names.fresh("__cell", df.columns)
    val cellUdf = udf { (bytes: Array[Byte]) =>
      Option(bytes).flatMap(Wkb.read).flatMap(cellOf(_, cellSize))
    }
    df.withColumn(tmp, cellUdf(wkbCol))
      .withColumn("cell_x", col(s"`$tmp`._1"))
      .withColumn("cell_y", col(s"`$tmp`._2"))
      .drop(tmp)
  }

  /** Grid-partitioned spatial self-join: all pairs of POINT geometries
    * within `maxDist` of each other — the join [[gridCells]] indexes
    * for. Candidates come from an equi-join of each point's 3×3
    * neighbor-cell explosion against home cells (with `cellSize ≥
    * maxDist`, any qualifying pair is at most one cell apart, and the
    * a<b orientation filter makes every pair appear EXACTLY once — no
    * distinct pass); the verify is exact integer arithmetic on
    * micro-unit coordinates (`floor(x·10⁶)`), squared distance against
    * a squared fixed-point radius — replayable cross-engine with zero
    * float slack. The LSH dedup pattern (bucket equi-join, bounded
    * candidates, exact verify) applied to space.
    *
    * Returns (id_a, id_b, dist2_fp2) with dist2_fp2 in squared
    * micro-units; unparsable/null WKB rows drop out of the pairing
    * (no cell), the standard contract.
    *
    * 100 TB shape: shuffle keys are (cell_x, cell_y) pairs — the
    * candidate explosion is ≤9× the skinny (id, x, y) projection, and
    * geometry bytes never cross an exchange. `maxCellPoints > 0` is
    * the dense-cell skew guard, the spatial twin of the LSH
    * `maxBucketSize`: a degenerate cell (every geometry at one
    * landmark) otherwise costs m² pair work. Cells are RANK-TRUNCATED
    * (first `maxCellPoints` points by id participate; later points
    * drop out of pairing) rather than dropped wholesale — spatial
    * density is real signal, so the guard bounds work at cap² per
    * cell without zeroing dense regions. */
  def neighborPairs(df: DataFrame, idCol: Column, wkbCol: Column,
      cellSize: Double, maxDist: Double, maxCellPoints: Int = 0): DataFrame = {
    // one micro-unit of slack over maxDist: the fixed-point verify
    // accepts Δ up to maxDist + 1e-6, and a pair at exactly that
    // distance must still be at most one cell apart or the 3×3 probe
    // would miss what the verify accepts
    require(cellSize >= maxDist + 1e-6,
      s"cellSize ($cellSize) must exceed maxDist ($maxDist) by at least 1e-6 " +
        "or one-cell probing misses pairs the fixed-point verify accepts")
    require(maxDist > 0.0, "maxDist must be positive")
    require(cellSize <= MaxCellSize,
      s"cellSize ($cellSize) beyond $MaxCellSize overflows the fixed-point " +
        "squared-distance arithmetic — rescale coordinates first")
    val xyUdf = udf { (bytes: Array[Byte]) =>
      Option(bytes).flatMap(Wkb.read).flatMap(finiteCenter).map { case (cx, cy) =>
        (math.floor(cx * 1e6).toLong, math.floor(cy * 1e6).toLong,
          math.floor(cx / cellSize).toLong, math.floor(cy / cellSize).toLong)
      }
    }
    // the parse + envelope pass is the expensive scan-local step and
    // BOTH self-join sides consume it — cache the skinny projection
    // AFTER the cap window (tracked; released via Caches.unpersistAll)
    // so geometry decode AND the cap's shuffle/sort run once, not once
    // per side. Caching post-cap also pins ONE survivor set: two
    // independent window evaluations could truncate different subsets
    // under duplicate ids, yielding asymmetric pairs across retries.
    val pts0 = df.select(idCol.as("id"), xyUdf(wkbCol).as("p"))
      .filter(col("p").isNotNull)
      .select(col("id"), col("p._1").as("x"), col("p._2").as("y"),
        col("p._3").as("cx"), col("p._4").as("cy"))
    val pts = graft.llm.Caches.persistTracked(if (maxCellPoints > 0) {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cx"), col("cy")).orderBy(col("id"))
      pts0.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= maxCellPoints).drop("__rn")
    } else pts0)
    val maxDistFp = math.floor(maxDist * 1e6).toLong
    val left = pts.select(col("id").as("id_a"), col("x").as("xa"), col("y").as("ya"),
        explode(expr("transform(sequence(-1, 1), i -> cx + i)")).as("pcx"),
        col("cy").as("cy0"))
      .select(col("id_a"), col("xa"), col("ya"), col("pcx"),
        explode(expr("transform(sequence(-1, 1), i -> cy0 + i)")).as("pcy"))
    val right = pts.select(col("id").as("id_b"), col("x").as("xb"), col("y").as("yb"),
      col("cx").as("pcx"), col("cy").as("pcy"))
    left.join(right, Seq("pcx", "pcy"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        ((col("xa") - col("xb")) * (col("xa") - col("xb")) +
          (col("ya") - col("yb")) * (col("ya") - col("yb"))).as("dist2_fp2"))
      .filter(col("dist2_fp2") <= maxDistFp * maxDistFp)
  }

  /** Grid-partitioned containment join: (point_id, poly_id) for every
    * POINT inside a POLYGON — st_contains, the other spatial-join
    * workhorse, in the same candidate/verify shape as
    * [[neighborPairs]]: polygons explode to the cell RANGE their
    * envelope covers, points join by home cell, a fixed-point
    * envelope prefilter prunes, and the exact even-odd ray cast
    * ([[containsPoint]]) verifies — with the polygon bytes joining
    * back BY ID only for the surviving candidates, so geometry never
    * rides the candidate exchange.
    *
    * Unparsable/empty geometries on either side drop out of the join
    * (no cell), the standard contract.
    *
    * 100 TB shape: candidate volume is points × the few cells each
    * polygon overlaps; the verify shuffles only (point_id, poly_id,
    * two doubles); a polygon spanning many cells costs its cell count
    * in skinny index rows, never a copy of its ring data. */
  /** Cap on a single polygon's grid-cell span per axis: beyond it the
    * cell-range explosion itself becomes the scale hazard (one
    * continent-sized or garbage-coordinate polygon would emit millions
    * of index rows and can kill the job). Oversized geometries are
    * excluded from the index — production pre-splits giants before
    * spatial joining, the standard answer. */
  val MaxPolyCellsPerAxis = 4096L

  def containmentJoin(points: DataFrame, pIdCol: Column, pWkbCol: Column,
      polys: DataFrame, gIdCol: Column, gWkbCol: Column,
      cellSize: Double): DataFrame = {
    require(cellSize > 0.0 && cellSize <= MaxCellSize,
      s"cellSize must be in (0, $MaxCellSize]")
    val ptUdf = udf { (bytes: Array[Byte]) =>
      Option(bytes).flatMap(Wkb.read).flatMap(finiteCenter).map { case (cx, cy) =>
        (cx, cy, math.floor(cx * 1e6).toLong, math.floor(cy * 1e6).toLong,
          math.floor(cx / cellSize).toLong, math.floor(cy / cellSize).toLong)
      }
    }
    val envUdf = udf { (bytes: Array[Byte]) =>
      Option(bytes).flatMap(Wkb.read).flatMap { g =>
        val (minX, minY, maxX, maxY) = envelope(g)
        val finite = java.lang.Double.isFinite(minX) && java.lang.Double.isFinite(minY) &&
          java.lang.Double.isFinite(maxX) && java.lang.Double.isFinite(maxY) &&
          math.abs(minX) <= MaxCoord && math.abs(minY) <= MaxCoord &&
          math.abs(maxX) <= MaxCoord && math.abs(maxY) <= MaxCoord
        if (!finite) None
        else {
          val cx0 = math.floor(minX / cellSize).toLong
          val cx1 = math.floor(maxX / cellSize).toLong
          val cy0 = math.floor(minY / cellSize).toLong
          val cy1 = math.floor(maxY / cellSize).toLong
          // see MaxPolyCellsPerAxis — an unbounded span must not explode
          if (cx1 - cx0 >= MaxPolyCellsPerAxis || cy1 - cy0 >= MaxPolyCellsPerAxis) None
          else Some((math.floor(minX * 1e6).toLong, math.floor(minY * 1e6).toLong,
            math.floor(maxX * 1e6).toLong, math.floor(maxY * 1e6).toLong,
            cx0, cx1, cy0, cy1))
        }
      }
    }
    val pts = points.select(pIdCol.as("point_id"), ptUdf(pWkbCol).as("p"))
      .filter(col("p").isNotNull)
      .select(col("point_id"), col("p._1").as("px"), col("p._2").as("py"),
        col("p._3").as("pxf"), col("p._4").as("pyf"),
        col("p._5").as("pcx"), col("p._6").as("pcy"))
    val polyIdx = polys.select(gIdCol.as("poly_id"), envUdf(gWkbCol).as("e"))
      .filter(col("e").isNotNull)
      .select(col("poly_id"), col("e._1").as("x0f"), col("e._2").as("y0f"),
        col("e._3").as("x1f"), col("e._4").as("y1f"),
        explode(expr("sequence(e._5, e._6)")).as("pcx"), col("e._7").as("cy0"),
        col("e._8").as("cy1"))
      .select(col("poly_id"), col("x0f"), col("y0f"), col("x1f"), col("y1f"),
        col("pcx"), explode(expr("sequence(cy0, cy1)")).as("pcy"))
    // INCLUSIVE prefilter: floor is monotone, so minX <= px <= maxX
    // implies x0f <= pxf <= x1f — a strict compare would drop inside
    // points within one micro-unit of the envelope edge before the
    // exact ray cast (the decider) ever saw them
    val cand = pts.join(polyIdx, Seq("pcx", "pcy"))
      .filter(col("pxf") >= col("x0f") && col("pxf") <= col("x1f") &&
        col("pyf") >= col("y0f") && col("pyf") <= col("y1f"))
      .select(col("point_id"), col("poly_id"), col("px"), col("py"))
    val verifyUdf = udf { (bytes: Array[Byte], px: Double, py: Double) =>
      Wkb.read(bytes) match {
        case Some(p: Wkb.GPolygon) => containsPoint(p, px, py)
        case Some(Wkb.GMultiPolygon(gs, _, _)) => gs.exists(containsPoint(_, px, py))
        case _ => false
      }
    }
    cand.join(polys.select(gIdCol.as("poly_id"), gWkbCol.as("__poly_wkb")), Seq("poly_id"))
      .filter(verifyUdf(col("__poly_wkb"), col("px"), col("py")))
      .select(col("point_id"), col("poly_id"))
  }
}
