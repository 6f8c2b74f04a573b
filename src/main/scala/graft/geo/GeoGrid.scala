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

  /** Geometry as gridded: curved segments replaced by their sampled
    * linearization (the q15 operator at its default step), because a
    * circular arc can bulge PAST its control points' bbox — a major
    * arc from (1,0) via (-1,0) to (0,1) traverses y < -1 while its
    * control bbox stops at y = 0 — so walking control points could
    * miss the cells the true curve crosses. Linear geometries pass
    * through untouched; a malformed curve that fails to linearize
    * falls back to its control points (the pre-round-9 bound). */
  private[geo] def linearized(g: Wkb.Geom): Wkb.Geom =
    try Linearize.linearize(g, Linearize.effectiveStep(Double.NaN))
    catch { case scala.util.control.NonFatal(_) => g }

  /** Envelope (minX, minY, maxX, maxY) over every vertex of the
    * LINEARIZED geometry (see [[linearized]]) — exact for linear
    * types, within the arc-sampling tolerance for curved ones (the
    * sampled chain touches the true arc at every step). */
  def envelope(g0: Wkb.Geom): (Double, Double, Double, Double) = {
    val g = linearized(g0)
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

  /** Largest supported cellSize/maxDist: `dist2_fp2` sums TWO squared
    * axis deltas of adjacent-cell candidates, each up to
    * `(2·cellSize·10⁶)²`, so the bound is
    * `2·(2·cellSize·10⁶)² ≤ Long.MaxValue` ⇒
    * `cellSize ≤ √(Long.MaxValue/2)/(2·10⁶) ≈ 1073.74` — beyond it a
    * diagonal pair's distance could wrap negative and pass the radius
    * filter, so the operators refuse instead. */
  val MaxCellSize = 1073.0

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
    * (no cell), the standard contract — and the polys side indexes
    * ONLY what the verify can match: geometries that are not
    * (Multi)Polygon after linearization are excluded at build time
    * rather than silently yielding zero matches downstream (curved
    * surfaces participate via their linearization).
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

  /** The (Multi)Polygon parts of a geometry — empty for anything else. */
  private[geo] def polysIn(g: Wkb.Geom): Array[Wkb.GPolygon] = g match {
    case p: Wkb.GPolygon            => Array(p)
    case Wkb.GMultiPolygon(gs, _, _) => gs
    case _                           => Array.empty
  }

  /** Count of actual polygon-WKB decodes performed by the memoized
    * verify parsers — read by specs (local mode, one JVM) to prove the
    * parse-once contract: a hot polygon containing m candidates must
    * decode once per run, not m times. */
  private[geo] val verifyDecodes = new java.util.concurrent.atomic.AtomicLong

  /** One-slot task-local memo of the last decoded polygon WKB: the
    * verify stage sorts candidates by the polygon side's id within
    * each partition, so consecutive rows share bytes and m verifies
    * of one polygon cost one decode. Keyed by byte-array equality
    * (cheap vs a parse) because the join materializes a fresh array
    * instance per row; state lives in ONE field so a shared instance
    * can never pair one polygon's bytes with another's rings. */
  private final class PolyMemo extends Serializable {
    @transient private var last: (Array[Byte], Array[Wkb.GPolygon]) = _
    def polysOf(bytes: Array[Byte]): Array[Wkb.GPolygon] = {
      val l = last
      if (l != null && java.util.Arrays.equals(l._1, bytes)) l._2
      else {
        verifyDecodes.incrementAndGet()
        val ps = Option(bytes).flatMap(Wkb.read).map(linearized)
          .map(polysIn).getOrElse(Array.empty[Wkb.GPolygon])
        last = (bytes, ps)
        ps
      }
    }
  }

  /** Cell-range index of a polygon side: one row per (id, covered
    * cell), carrying the fixed-point envelope and the cell-range
    * START per axis (for the overlap join's ownership dedup).
    * Geometries that are not (Multi)Polygon after linearization are
    * EXCLUDED at build time — the verify stage could never match
    * them, so indexing them would only manufacture dead candidates;
    * curved surfaces (CurvePolygon, MultiSurface) participate via
    * their linearization, same as the envelope contract. Unscorable
    * envelopes (empty/NaN/out-of-range) and spans beyond
    * [[MaxPolyCellsPerAxis]] are excluded as before. */
  private def polyCellIndex(df: DataFrame, idCol: Column, wkbCol: Column,
      cellSize: Double): DataFrame = {
    val envUdf = udf { (bytes: Array[Byte]) =>
      Option(bytes).flatMap(Wkb.read).map(linearized).flatMap { g =>
        if (polysIn(g).isEmpty) None
        else {
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
    }
    df.select(idCol.as("id"), envUdf(wkbCol).as("e"))
      .filter(col("e").isNotNull)
      .select(col("id"), col("e._1").as("x0f"), col("e._2").as("y0f"),
        col("e._3").as("x1f"), col("e._4").as("y1f"),
        col("e._5").as("cx0"), col("e._7").as("cy0"),
        explode(expr("sequence(e._5, e._6)")).as("pcx"), col("e._8").as("cy1"))
      .select(col("id"), col("x0f"), col("y0f"), col("x1f"), col("y1f"),
        col("cx0"), col("cy0"),
        col("pcx"), explode(expr("sequence(cy0, cy1)")).as("pcy"))
  }

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
    val pts = points.select(pIdCol.as("point_id"), ptUdf(pWkbCol).as("p"))
      .filter(col("p").isNotNull)
      .select(col("point_id"), col("p._1").as("px"), col("p._2").as("py"),
        col("p._3").as("pxf"), col("p._4").as("pyf"),
        col("p._5").as("pcx"), col("p._6").as("pcy"))
    val polyIdx = polyCellIndex(polys, gIdCol, gWkbCol, cellSize)
      .select(col("id").as("poly_id"), col("x0f"), col("y0f"),
        col("x1f"), col("y1f"), col("pcx"), col("pcy"))
    // INCLUSIVE prefilter: floor is monotone, so minX <= px <= maxX
    // implies x0f <= pxf <= x1f — a strict compare would drop inside
    // points within one micro-unit of the envelope edge before the
    // exact ray cast (the decider) ever saw them
    val cand = pts.join(polyIdx, Seq("pcx", "pcy"))
      .filter(col("pxf") >= col("x0f") && col("pxf") <= col("x1f") &&
        col("pyf") >= col("y0f") && col("pyf") <= col("y1f"))
      .select(col("point_id"), col("poly_id"), col("px"), col("py"))
    val memo = new PolyMemo
    // asNondeterministic pins the filter ABOVE the sort: Catalyst
    // happily pushes a deterministic UDF predicate through the sort
    // into the join condition, where rows arrive in join order and
    // the memo would never hit (measured: one decode per candidate).
    // The function is semantically deterministic — the marker only
    // blocks the reordering.
    val verifyUdf = udf { (bytes: Array[Byte], px: Double, py: Double) =>
      memo.polysOf(bytes).exists(containsPoint(_, px, py))
    }.asNondeterministic()
    // sortWithinPartitions (no exchange — the id join already
    // co-located each polygon's candidates) makes the memo hit: one
    // decode per polygon per partition, not one per candidate
    cand.join(polys.select(gIdCol.as("poly_id"), gWkbCol.as("__poly_wkb")), Seq("poly_id"))
      .sortWithinPartitions(col("poly_id"))
      .filter(verifyUdf(col("__poly_wkb"), col("px"), col("py")))
      .select(col("point_id"), col("poly_id"))
  }

  /** Segment–segment intersection, touching included: the standard
    * orientation test plus collinear on-segment handling. Exact for
    * inputs whose orientation signs are unambiguous at double
    * precision — callers with boundary semantics keep vertices off
    * edges, the [[containsPoint]] contract. */
  private[geo] def segmentsIntersect(ax: Double, ay: Double, bx: Double, by: Double,
      cx: Double, cy: Double, dx: Double, dy: Double): Boolean = {
    def orient(px: Double, py: Double, qx: Double, qy: Double,
        rx: Double, ry: Double): Int = {
      val v = (qx - px) * (ry - py) - (qy - py) * (rx - px)
      if (v > 0) 1 else if (v < 0) -1 else 0
    }
    def onSeg(px: Double, py: Double, qx: Double, qy: Double,
        rx: Double, ry: Double): Boolean =
      math.min(px, qx) <= rx && rx <= math.max(px, qx) &&
        math.min(py, qy) <= ry && ry <= math.max(py, qy)
    val o1 = orient(ax, ay, bx, by, cx, cy)
    val o2 = orient(ax, ay, bx, by, dx, dy)
    val o3 = orient(cx, cy, dx, dy, ax, ay)
    val o4 = orient(cx, cy, dx, dy, bx, by)
    (o1 != o2 && o3 != o4) ||
      (o1 == 0 && onSeg(ax, ay, bx, by, cx, cy)) ||
      (o2 == 0 && onSeg(ax, ay, bx, by, dx, dy)) ||
      (o3 == 0 && onSeg(cx, cy, dx, dy, ax, ay)) ||
      (o4 == 0 && onSeg(cx, cy, dx, dy, bx, by))
  }

  /** Exact st_intersects over two (multi)polygon vertex sets: any
    * vertex of one inside the other (even-odd — a vertex in a HOLE is
    * outside), or any edge pair crossing/touching. Covers full
    * containment (vertices inside), partial overlap, boundary-only
    * touching, and the plus-sign overlap where no vertex of either
    * lies inside the other (edges cross); two polygons separated by a
    * hole correctly do NOT intersect. */
  private[geo] def polygonsIntersect(pa: Array[Wkb.GPolygon],
      pb: Array[Wkb.GPolygon]): Boolean = {
    def anyVertexIn(src: Array[Wkb.GPolygon], dst: Array[Wkb.GPolygon]): Boolean =
      src.exists(_.rings.exists(_.exists(v =>
        dst.exists(containsPoint(_, v(0), v(1))))))
    def edges(ps: Array[Wkb.GPolygon]): Iterator[(Array[Double], Array[Double])] =
      for {
        p <- ps.iterator
        r <- p.rings.iterator if r.length >= 2
        i <- (0 until r.length - 1).iterator
      } yield (r(i), r(i + 1))
    anyVertexIn(pa, pb) || anyVertexIn(pb, pa) || {
      val eb = edges(pb).toArray
      edges(pa).exists { case (p1, p2) =>
        eb.exists { case (q1, q2) =>
          segmentsIntersect(p1(0), p1(1), p2(0), p2(1), q1(0), q1(1), q2(0), q2(1))
        }
      }
    }
  }

  /** Grid-partitioned polygon ⋈ polygon overlap join (st_intersects):
    * (id_a, id_b) for every polygon of `a` intersecting a polygon of
    * `b` — the third spatial workhorse beside [[neighborPairs]]
    * (distance) and [[containmentJoin]] (point-in-polygon), and the
    * one the reference's platform actually ships: polygon layers
    * overlaid and synced to PostGIS (`sync_df_to_pgdb.py:198-202`
    * wraps geometry columns in ST_GeomFromWKB; the type table
    * `udf_tools.py:12-40` is polygon-heavy).
    *
    * Same candidate/verify shape as the siblings: BOTH sides explode
    * to the cell ranges their envelopes cover ([[polyCellIndex]]),
    * candidates come from the cell equi-join, a fixed-point
    * envelope-overlap prefilter prunes (inclusive — floor is
    * monotone, so true overlap implies fp overlap), and each
    * surviving pair is OWNED by exactly one cell — the first cell of
    * the two cell-ranges' intersection, `(max(cx0ₐ, cx0ᵦ), max(cy0ₐ,
    * cy0ᵦ))`, which both ranges contain whenever the envelopes
    * overlap — so every pair is emitted once with no distinct pass.
    * The exact verify ([[polygonsIntersect]]) joins geometry bytes
    * back BY ID for survivors only.
    *
    * 100 TB shape: geometry bytes never ride the candidate exchange
    * (candidate rows are ids + six longs); the verify's a-side parse
    * is memoized under a per-partition id_a sort; one garbage
    * continent-sized polygon is excluded by [[MaxPolyCellsPerAxis]]
    * instead of exploding the index. The per-pair edge test is
    * O(verts_a·verts_b) — production pre-splits giant polygons, the
    * same contract as the cell-span cap. */
  def overlapJoin(a: DataFrame, aIdCol: Column, aWkbCol: Column,
      b: DataFrame, bIdCol: Column, bWkbCol: Column,
      cellSize: Double): DataFrame = {
    require(cellSize > 0.0 && cellSize <= MaxCellSize,
      s"cellSize must be in (0, $MaxCellSize]")
    val ia = polyCellIndex(a, aIdCol, aWkbCol, cellSize)
      .select(col("id").as("id_a"), col("x0f").as("ax0"), col("y0f").as("ay0"),
        col("x1f").as("ax1"), col("y1f").as("ay1"),
        col("cx0").as("acx0"), col("cy0").as("acy0"), col("pcx"), col("pcy"))
    val ib = polyCellIndex(b, bIdCol, bWkbCol, cellSize)
      .select(col("id").as("id_b"), col("x0f").as("bx0"), col("y0f").as("by0"),
        col("x1f").as("bx1"), col("y1f").as("by1"),
        col("cx0").as("bcx0"), col("cy0").as("bcy0"), col("pcx"), col("pcy"))
    val cand = ia.join(ib, Seq("pcx", "pcy"))
      .filter(col("ax0") <= col("bx1") && col("bx0") <= col("ax1") &&
        col("ay0") <= col("by1") && col("by0") <= col("ay1"))
      .filter(col("pcx") === greatest(col("acx0"), col("bcx0")) &&
        col("pcy") === greatest(col("acy0"), col("bcy0")))
      .select(col("id_a"), col("id_b"))
    val memo = new PolyMemo
    // asNondeterministic: see containmentJoin — without it the filter
    // is pushed below the id_a sort and the memo never hits
    val verifyUdf = udf { (bytesA: Array[Byte], bytesB: Array[Byte]) =>
      val pb = Option(bytesB).flatMap(Wkb.read).map(linearized)
        .map(polysIn).getOrElse(Array.empty[Wkb.GPolygon])
      polygonsIntersect(memo.polysOf(bytesA), pb)
    }.asNondeterministic()
    cand.join(a.select(aIdCol.as("id_a"), aWkbCol.as("__a_wkb")), Seq("id_a"))
      .join(b.select(bIdCol.as("id_b"), bWkbCol.as("__b_wkb")), Seq("id_b"))
      .sortWithinPartitions(col("id_a"))
      .filter(verifyUdf(col("__a_wkb"), col("__b_wkb")))
      .select(col("id_a"), col("id_b"))
  }

  /** [[overlapJoin]] upgraded from WHICH pairs intersect to HOW MUCH:
    * every intersecting pair with TWICE the intersection area in
    * micro-unit fp² (`GeoStats.intersectionArea2Fp` — exact rational
    * Sutherland–Hodgman when a side is convex, envelope-intersection
    * fallback flagged `exact = false` otherwise). The overlay-analysis
    * follow-up to st_intersects: land-cover × admin-area reporting
    * runs on intersection areas, not intersection booleans.
    *
    * 100 TB shape: identical to [[overlapJoin]] — the pair discovery
    * IS overlapJoin, and the area computation adds one scan-local
    * projection over the surviving pairs' bytes (re-joined BY ID, so
    * geometry still never rides the candidate exchange). */
  def overlapAreaJoin(a: DataFrame, aIdCol: Column, aWkbCol: Column,
      b: DataFrame, bIdCol: Column, bWkbCol: Column,
      cellSize: Double): DataFrame = {
    val pairs = overlapJoin(a, aIdCol, aWkbCol, b, bIdCol, bWkbCol, cellSize)
    val areaUdf = udf { (bytesA: Array[Byte], bytesB: Array[Byte]) =>
      val pa = Option(bytesA).flatMap(Wkb.read).map(linearized)
        .map(polysIn).getOrElse(Array.empty[Wkb.GPolygon])
      val pb = Option(bytesB).flatMap(Wkb.read).map(linearized)
        .map(polysIn).getOrElse(Array.empty[Wkb.GPolygon])
      GeoStats.intersectionArea2Fp(pa, pb)
    }
    pairs
      .join(a.select(aIdCol.as("id_a"), aWkbCol.as("__a_wkb")), Seq("id_a"))
      .join(b.select(bIdCol.as("id_b"), bWkbCol.as("__b_wkb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        areaUdf(col("__a_wkb"), col("__b_wkb")).as("r"))
      .select(col("id_a"), col("id_b"),
        col("r._1").as("area2_fp2"), col("r._2").as("exact"))
  }

  /** Grid admission audit: every input row with the REASON the grid
    * family would admit or refuse it — the data-quality counterpart
    * of the silent-exclusion contract ([[finiteCenter]] returning
    * None, the [[MaxPolyCellsPerAxis]] span cap). The join operators
    * are right to drop unscorable geometries without ceremony; a
    * curation pipeline auditing a layer needs the counts and the ids.
    *
    * Reasons, checked in order: `null_wkb` (null bytes), `unparsable`
    * (codec refuses), `empty_or_nan` (no finite envelope center —
    * empty geometries, NaN vertices), `coord_overflow` (center beyond
    * [[MaxCoord]], the fixed-point long bound), `span_exceeded`
    * (envelope covers ≥ [[MaxPolyCellsPerAxis]] cells on an axis —
    * the giant-geometry guard), else `ok` with the home cell.
    *
    * 100 TB shape: one scan-local projection, zero shuffle — the
    * caller aggregates reasons however it likes. */
  def gridAudit(df: DataFrame, idCol: Column, wkbCol: Column,
      cellSize: Double): DataFrame = {
    require(cellSize > 0.0 && cellSize <= MaxCellSize,
      s"cellSize must be in (0, $MaxCellSize]")
    val auditUdf = udf { (bytes: Array[Byte]) =>
      if (bytes == null) ("null_wkb", None: Option[Long], None: Option[Long])
      else Wkb.read(bytes) match {
        case None => ("unparsable", None, None)
        case Some(g0) =>
          val g = linearized(g0)
          val (minX, minY, maxX, maxY) = envelope(g)
          val cx = (minX + maxX) / 2.0
          val cy = (minY + maxY) / 2.0
          if (!java.lang.Double.isFinite(cx) || !java.lang.Double.isFinite(cy))
            ("empty_or_nan", None, None)
          else if (math.abs(cx) > MaxCoord || math.abs(cy) > MaxCoord)
            ("coord_overflow", None, None)
          else {
            val sx = math.floor(maxX / cellSize).toLong - math.floor(minX / cellSize).toLong
            val sy = math.floor(maxY / cellSize).toLong - math.floor(minY / cellSize).toLong
            if (sx >= MaxPolyCellsPerAxis || sy >= MaxPolyCellsPerAxis)
              ("span_exceeded", None, None)
            else ("ok", Some(math.floor(cx / cellSize).toLong),
              Some(math.floor(cy / cellSize).toLong))
          }
      }
    }
    df.select(idCol.as("id"), auditUdf(wkbCol).as("a"))
      .select(col("id"), col("a._1").as("reason"),
        col("a._2").as("cell_x"), col("a._3").as("cell_y"))
  }

  /** The (Multi)LineString parts of a geometry — empty for anything
    * else (curves participate via [[linearized]] upstream). */
  private[geo] def linesIn(g: Wkb.Geom): Array[Wkb.GLineString] = g match {
    case l: Wkb.GLineString              => Array(l)
    case Wkb.GMultiLineString(gs, _, _)  => gs
    case _                               => Array.empty
  }

  /** Exact `dist(P, segment AB) ≤ maxDistFp` in micro-unit integers:
    * the classic clamped-projection split — before A: |PA|² ≤ r²; past
    * B: |PB|² ≤ r²; between: cross² ≤ r²·|AB|². BigInt throughout —
    * a long segment's deltas reach 2·MaxCoord·10⁶ and their products
    * overflow any fixed width; exactness is the point, and the cost
    * lands on verified CANDIDATES only, never the corpus. */
  private[geo] def segWithinFp(px: Long, py: Long, ax: Long, ay: Long,
      bx: Long, by: Long, maxDistFp: Long): Boolean = {
    val apx = BigInt(px - ax); val apy = BigInt(py - ay)
    val abx = BigInt(bx - ax); val aby = BigInt(by - ay)
    val r2 = BigInt(maxDistFp) * BigInt(maxDistFp)
    val td = abx * abx + aby * aby
    val tn = apx * abx + apy * aby
    if (td == 0 || tn <= 0) apx * apx + apy * apy <= r2
    else if (tn >= td) {
      val bpx = BigInt(px - bx); val bpy = BigInt(py - by)
      bpx * bpx + bpy * bpy <= r2
    } else {
      val cross = abx * apy - aby * apx
      cross * cross <= r2 * td
    }
  }

  /** Grid-partitioned point ⋈ linestring distance join: `(point_id,
    * line_id, n_seg_hits)` for every point within `maxDist` of a
    * (multi)linestring, with `n_seg_hits` = how many of that line's
    * segments are within reach — the snap-to-network workhorse
    * (address → nearest road) beside [[neighborPairs]] (point–point),
    * [[containmentJoin]] (point-in-polygon) and [[overlapJoin]]
    * (polygon–polygon). Line layers are what the reference's platform
    * ships beside polygons (the type table `udf_tools.py:12-40` lists
    * the full LineString family).
    *
    * Candidate/verify, like every sibling: lines explode into
    * SEGMENTS, each indexed under the cell range its envelope covers
    * (bounded by [[MaxPolyCellsPerAxis]], the giant-geometry guard);
    * points probe their own cell — `cellSize ≥ maxDist` makes the
    * segment side's range, already inflated to the envelope, meet the
    * point's 3×3 probe for every true pair; each (point, segment)
    * candidate is OWNED by one cell (first cell of probe ∩ range, the
    * overlapJoin dedup) so no distinct pass runs; the exact integer
    * verify is [[segWithinFp]].
    *
    * 100 TB shape: shuffle keys are grid cells; candidate rows carry
    * ids plus six longs — ring data never rides an exchange; a
    * garbage world-spanning segment is excluded by the span cap
    * rather than exploding the index; skew composes with the q79
    * rank-truncation pattern upstream (pre-split or cap dense cells
    * before joining). */
  def lineDistanceJoin(points: DataFrame, pIdCol: Column, pWkbCol: Column,
      lines: DataFrame, lIdCol: Column, lWkbCol: Column,
      cellSize: Double, maxDist: Double): DataFrame = {
    require(maxDist > 0.0, "maxDist must be positive")
    require(cellSize >= maxDist + 1e-6,
      s"cellSize ($cellSize) must exceed maxDist ($maxDist) by at least 1e-6 " +
        "or one-cell probing misses pairs the fixed-point verify accepts")
    require(cellSize <= MaxCellSize,
      s"cellSize must be in (0, $MaxCellSize]")
    val segsUdf = udf { (bytes: Array[Byte]) =>
      Option(bytes).flatMap(Wkb.read).map(linearized).map { g =>
        linesIn(g).iterator.flatMap { ls =>
          ls.pts.iterator.sliding(2).withPartial(false).flatMap { w =>
            val a = w.head; val b = w.last
            val minX = math.min(a(0), b(0)); val maxX = math.max(a(0), b(0))
            val minY = math.min(a(1), b(1)); val maxY = math.max(a(1), b(1))
            val finite = java.lang.Double.isFinite(minX) &&
              java.lang.Double.isFinite(minY) &&
              java.lang.Double.isFinite(maxX) &&
              java.lang.Double.isFinite(maxY) &&
              math.abs(minX) <= MaxCoord && math.abs(minY) <= MaxCoord &&
              math.abs(maxX) <= MaxCoord && math.abs(maxY) <= MaxCoord
            if (!finite) None
            else {
              val cx0 = math.floor(minX / cellSize).toLong
              val cx1 = math.floor(maxX / cellSize).toLong
              val cy0 = math.floor(minY / cellSize).toLong
              val cy1 = math.floor(maxY / cellSize).toLong
              if (cx1 - cx0 >= MaxPolyCellsPerAxis ||
                cy1 - cy0 >= MaxPolyCellsPerAxis) None
              else Some((math.floor(a(0) * 1e6).toLong, math.floor(a(1) * 1e6).toLong,
                math.floor(b(0) * 1e6).toLong, math.floor(b(1) * 1e6).toLong,
                cx0, cx1, cy0, cy1))
            }
          }
        }.toSeq
      }.getOrElse(Seq.empty)
    }
    val segIdx = lines.select(lIdCol.as("line_id"), explode(segsUdf(lWkbCol)).as("s"))
      .select(col("line_id"), col("s._1").as("axf"), col("s._2").as("ayf"),
        col("s._3").as("bxf"), col("s._4").as("byf"),
        col("s._5").as("scx0"), col("s._7").as("scy0"),
        explode(expr("sequence(s._5, s._6)")).as("pcx"), col("s._8").as("scy1"))
      .select(col("line_id"), col("axf"), col("ayf"), col("bxf"), col("byf"),
        col("scx0"), col("scy0"),
        col("pcx"), explode(expr("sequence(scy0, scy1)")).as("pcy"))
    val ptUdf = udf { (bytes: Array[Byte]) =>
      Option(bytes).flatMap(Wkb.read).flatMap(finiteCenter).map { case (cx, cy) =>
        (math.floor(cx * 1e6).toLong, math.floor(cy * 1e6).toLong,
          math.floor(cx / cellSize).toLong, math.floor(cy / cellSize).toLong)
      }
    }
    val pts = points.select(pIdCol.as("point_id"), ptUdf(pWkbCol).as("p"))
      .filter(col("p").isNotNull)
      .select(col("point_id"), col("p._1").as("pxf"), col("p._2").as("pyf"),
        col("p._3").as("hcx"), col("p._4").as("hcy"))
    val probes = pts
      .select(col("point_id"), col("pxf"), col("pyf"), col("hcx"), col("hcy"),
        explode(expr("transform(sequence(-1, 1), i -> hcx + i)")).as("pcx"))
      .select(col("point_id"), col("pxf"), col("pyf"), col("hcx"), col("hcy"),
        col("pcx"), explode(expr("transform(sequence(-1, 1), i -> hcy + i)")).as("pcy"))
    val maxDistFp = math.floor(maxDist * 1e6).toLong
    val verifyUdf = udf { (px: Long, py: Long, ax: Long, ay: Long,
        bx: Long, by: Long) =>
      segWithinFp(px, py, ax, ay, bx, by, maxDistFp)
    }
    probes.join(segIdx, Seq("pcx", "pcy"))
      // one owner cell per (point, segment): the first cell of
      // probe ∩ segment-range — both contain it whenever they meet
      .filter(col("pcx") === greatest(col("hcx") - 1, col("scx0")) &&
        col("pcy") === greatest(col("hcy") - 1, col("scy0")))
      .filter(verifyUdf(col("pxf"), col("pyf"), col("axf"), col("ayf"),
        col("bxf"), col("byf")))
      .groupBy(col("point_id"), col("line_id"))
      .agg(count(lit(1)).as("n_seg_hits"))
  }

  /** Grid-partitioned EXACT k-nearest-neighbor join: for every query
    * POINT, the `k` nearest corpus POINTs by squared micro-unit
    * distance, ties by neighbor id — the snap-to-nearest-POI shape
    * behind PostGIS's `ORDER BY geom <-> target LIMIT k` idiom that
    * follows every point-layer ship (the reference pushes point
    * layers to PostGIS exactly for this, sync_df_to_pgdb.py:198-202).
    * Returns `(query_id, neighbor_id, dist2_fp2, nn_rank)` with
    * `nn_rank` 1..k; queries with unparsable/empty WKB drop out, a
    * corpus smaller than `k` yields fewer rows per query.
    *
    * Expanding-ring search with PER-QUERY radii:
    *  - each query's first probe is the cell block at radius
    *    `max(1, Chebyshev distance from its home cell to the corpus
    *    cell bounding box)` — a far-off query jumps straight to the
    *    first block that can contain corpus cells instead of grinding
    *    empty rings;
    *  - probe cells are clipped to the corpus cell box, so no round
    *    ever enumerates cells that cannot hold a corpus point;
    *  - after a probe at radius r, a query retires when its k-th
    *    candidate is STRICTLY inside the covered radius
    *    (`kth_dist2 < (r·cellSizeFp)²` — the standard grid-kNN
    *    termination proof: an unprobed point differs by more than
    *    r·cellSize on some axis, so its floored micro-unit delta is
    *    ≥ r·cellSizeFp and it cannot displace the k-th even on the id
    *    tie-break), or when its block covers the whole corpus box
    *    (fewer than k neighbors simply don't exist);
    *  - survivors re-probe ONLY the new ring (cells with Chebyshev
    *    distance exactly r+1), merging into a per-query running top-k,
    *    so no cell is ever joined twice for the same query.
    *
    * 100 TB shape: every round shuffles skinny `(id, two longs)` rows
    * keyed by grid cell — geometry bytes never cross an exchange; the
    * running state is a ≤k-row-per-query frame plus eight bounds
    * scalars on the driver; the round count is data-bounded by the
    * corpus cell span (dense corpora retire almost everything at the
    * first 3×3 block), matching the fixed-point-iteration contract of
    * the PageRank/CC operators. */
  def knnJoin(queries: DataFrame, qIdCol: Column, qWkbCol: Column,
      corpus: DataFrame, cIdCol: Column, cWkbCol: Column,
      cellSize: Double, k: Int): DataFrame = {
    require(k >= 1, "k must be at least 1")
    require(cellSize > 0.0, "cellSize must be positive")
    require(cellSize <= MaxCellSize,
      s"cellSize ($cellSize) beyond $MaxCellSize overflows the fixed-point " +
        "squared-distance arithmetic — rescale coordinates first")
    import graft.llm.Caches
    val cFp = math.floor(cellSize * 1e6).toLong
    val xyUdf = udf { (bytes: Array[Byte]) =>
      Option(bytes).flatMap(Wkb.read).flatMap(finiteCenter).map { case (cx, cy) =>
        (math.floor(cx * 1e6).toLong, math.floor(cy * 1e6).toLong,
          math.floor(cx / cellSize).toLong, math.floor(cy / cellSize).toLong)
      }
    }
    val qs = Caches.persistTracked(
      queries.select(qIdCol.as("query_id"), xyUdf(qWkbCol).as("p"))
        .filter(col("p").isNotNull)
        .select(col("query_id"), col("p._1").as("qx"), col("p._2").as("qy"),
          col("p._3").as("qcx"), col("p._4").as("qcy")))
    val cs = Caches.persistTracked(
      corpus.select(cIdCol.as("neighbor_id"), xyUdf(cWkbCol).as("p"))
        .filter(col("p").isNotNull)
        .select(col("neighbor_id"), col("p._1").as("nx"), col("p._2").as("ny"),
          col("p._3").as("pcx"), col("p._4").as("pcy")))
    def emptyResult: DataFrame = qs.limit(0).crossJoin(cs.limit(0))
      .select(col("query_id"), col("neighbor_id"),
        lit(0L).as("dist2_fp2"), lit(0L).as("nn_rank"))
    val cb = cs.agg(
      min("pcx").as("a"), max("pcx").as("b"), min("pcy").as("c"),
      max("pcy").as("d"), min("nx").as("e"), max("nx").as("f"),
      min("ny").as("g"), max("ny").as("h")).collect()(0)
    if (cb.isNullAt(0)) return emptyResult
    val qb = qs.agg(min("qx").as("a"), max("qx").as("b"),
      min("qy").as("c"), max("qy").as("d")).collect()(0)
    if (qb.isNullAt(0)) return emptyResult
    val (minCx, maxCx, minCy, maxCy) =
      (cb.getLong(0), cb.getLong(1), cb.getLong(2), cb.getLong(3))
    // overflow guard over the UNION of both sides' fp coordinates,
    // with 2·cellSizeFp slack because the termination threshold is
    // (r·cellSizeFp)² for r up to the cross-box Chebyshev span + 1
    val spanX = BigInt(math.max(cb.getLong(5), qb.getLong(1)) -
      math.min(cb.getLong(4), qb.getLong(0))) + 2 * BigInt(cFp)
    val spanY = BigInt(math.max(cb.getLong(7), qb.getLong(3)) -
      math.min(cb.getLong(6), qb.getLong(2))) + 2 * BigInt(cFp)
    require(spanX * spanX + spanY * spanY <= BigInt(Long.MaxValue),
      "coordinate span overflows fixed-point squared-distance " +
        "arithmetic — rescale coordinates first")
    // per-query state: rprev = largest Chebyshev radius already
    // probed (-1 = nothing yet), rcur = radius this round probes to
    var active = Caches.persistTracked(qs
      .withColumn("rcur", greatest(lit(1L),
        greatest(lit(minCx) - col("qcx"), col("qcx") - lit(maxCx), lit(0L)),
        greatest(lit(minCy) - col("qcy"), col("qcy") - lit(maxCy), lit(0L))))
      .withColumn("rprev", lit(-1L)))
    var topk: DataFrame = null
    // hard bound: by radius maxR every block covers the corpus box
    val qcb = qs.agg(min("qcx"), max("qcx"), min("qcy"), max("qcy")).collect()(0)
    val maxR = math.max(
      math.max(math.abs(qcb.getLong(1) - minCx), math.abs(maxCx - qcb.getLong(0))),
      math.max(math.abs(qcb.getLong(3) - minCy), math.abs(maxCy - qcb.getLong(2)))) + 1
    // one ring strip as a SQL array expression, empty-guarded: Spark's
    // sequence(a, b) DESCENDS when a > b, so an inverted (clipped-out)
    // range must yield the typed empty array, not a reversed strip
    def stripSql(pxLo: String, pxHi: String, pyLo: String, pyHi: String) =
      s"CASE WHEN ($pxLo) <= ($pxHi) AND ($pyLo) <= ($pyHi) THEN " +
        s"flatten(transform(sequence($pxLo, $pxHi), px -> " +
        s"transform(sequence($pyLo, $pyHi), py -> struct(px AS pcx, py AS pcy)))) " +
        "ELSE cast(array() as array<struct<pcx:bigint,pcy:bigint>>) END"
    var rounds = 0L
    while (rounds <= maxR && !active.isEmpty) {
      // ONLY the new ring — Chebyshev radius in (rprev, rcur] — built
      // directly as four disjoint strips clipped to the corpus box
      // (bottom/top full-width rows, then left/right columns of the
      // middle band), instead of materializing the whole (2·rcur+1)²
      // block and filtering: a far-off query that jumps to a large
      // first radius would otherwise pay a block-sized array per row
      // every round — quadratic in radius. At rprev = -1 (first
      // probe) the four strips degenerate to exactly the full block.
      val pxLoF = s"greatest(qcx - rcur, ${minCx}L)"
      val pxHiF = s"least(qcx + rcur, ${maxCx}L)"
      val ringSql = "concat(" +
        stripSql(pxLoF, pxHiF,
          s"greatest(qcy - rcur, ${minCy}L)",
          s"least(qcy - rprev - 1, ${maxCy}L)") + ", " +
        stripSql(pxLoF, pxHiF,
          s"greatest(greatest(qcy + rprev + 1, qcy - rprev), ${minCy}L)",
          s"least(qcy + rcur, ${maxCy}L)") + ", " +
        stripSql(
          s"greatest(qcx - rcur, ${minCx}L)",
          s"least(qcx - rprev - 1, ${maxCx}L)",
          s"greatest(qcy - rprev, ${minCy}L)",
          s"least(qcy + rprev, ${maxCy}L)") + ", " +
        stripSql(
          s"greatest(greatest(qcx + rprev + 1, qcx - rprev), ${minCx}L)",
          s"least(qcx + rcur, ${maxCx}L)",
          s"greatest(qcy - rprev, ${minCy}L)",
          s"least(qcy + rprev, ${maxCy}L)") + ")"
      val probes = active
        .select(col("query_id"), col("qx"), col("qy"),
          explode(expr(ringSql)).as("c"))
        .select(col("query_id"), col("qx"), col("qy"),
          col("c.pcx").as("pcx"), col("c.pcy").as("pcy"))
      val cand = probes.join(cs, Seq("pcx", "pcy"))
        .select(col("query_id"), col("neighbor_id"),
          ((col("qx") - col("nx")) * (col("qx") - col("nx")) +
            (col("qy") - col("ny")) * (col("qy") - col("ny"))).as("dist2_fp2"))
      val merged = if (topk == null) cand else topk.unionByName(cand)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id"))
        .orderBy(col("dist2_fp2").asc, col("neighbor_id").asc)
      // LAZY localCheckpoint, not persist: the running top-k's plan is
      // a union chain over every probed ring — without per-round
      // truncation the logical plan (and its cached-plan rendering)
      // grows with the round count and a long expansion OOMs on pure
      // plan strings
      val newTop = merged.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= k).drop("__rn")
        .localCheckpoint(eager = false)
      val stats = newTop.groupBy(col("query_id"))
        .agg(count(lit(1)).as("__n"), max(col("dist2_fp2")).as("__kth"))
      active = active
        .join(stats, Seq("query_id"), "left")
        .filter(!((coalesce(col("__n"), lit(0L)) >= k &&
            col("__kth") < (col("rcur") * cFp) * (col("rcur") * cFp)) ||
          (col("qcx") - col("rcur") <= minCx &&
            col("qcx") + col("rcur") >= maxCx &&
            col("qcy") - col("rcur") <= minCy &&
            col("qcy") + col("rcur") >= maxCy)))
        .select(col("query_id"), col("qx"), col("qy"), col("qcx"), col("qcy"),
          (col("rcur") + 1).as("rcur"), col("rcur").as("rprev"))
        .localCheckpoint(eager = false)
      topk = newTop
      rounds += 1
    }
    if (topk == null) emptyResult
    else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id"))
        .orderBy(col("dist2_fp2").asc, col("neighbor_id").asc)
      topk.withColumn("nn_rank", row_number().over(w).cast("bigint"))
    }
  }
}
