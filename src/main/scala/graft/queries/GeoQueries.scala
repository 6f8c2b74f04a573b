package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.geo.{GeoFunctions, WkbCorpus}

/** Geo-function queries over the embedded WKB corpus, mirroring the
  * reference's notebook assertions
  * (`udfs/tests/wkb_registration_and_sql_tests.py:120-188`): register →
  * invoke from SQL → compare the exact type strings. The oracle side is
  * a literal VALUES table of the corpus's expected outputs, so the
  * DuckDB compare checks our engine's computed strings against the
  * reference contract, row by row.
  */
object GeoQueries {

  /** q14: get_wkb_geom_type over the corpus — both the BINARY (WKB
    * bytes) and STRING (hex) input paths of the polymorphic function. */
  def q14GeomType(s: SparkSession, dir: String): DataFrame = {
    GeoFunctions.registerAll(s)
    import s.implicits._
    WkbCorpus.cases.map { case (n, h, _) => (n, h) }.toDF("name", "wkb_hex")
      .withColumn("wkb", unhex(col("wkb_hex")))
      .select(col("name"),
        expr("get_wkb_geom_type(wkb)").as("geom_type"),
        expr("get_wkb_geom_type(wkb_hex)").as("geom_type_hex"))
      .orderBy("name")
  }

  /** Expected type after linearization (reference contract,
    * `wkb_registration_and_sql_tests.py:173-188`). */
  private[graft] def linearizedName(t: String): String = t match {
    case "CircularString" => "LineString"
    case "CompoundCurve"  => "LineString"
    case "CurvePolygon"   => "Polygon"
    case "MultiCurve"     => "MultiLineString"
    case "MultiSurface"   => "MultiPolygon"
    case other            => other
  }

  /** Rows fed to q15: the corpus plus an unparsable input exercising
    * the null contract (`udf_conversions.py:58-59`). */
  private def q15Rows: Seq[(String, String, String, Boolean)] =
    WkbCorpus.cases.map { case (n, h, e) => (n, h, linearizedName(e), false) } :+
      (("invalid_short", "0101", "Invalid (null input)", true))

  /** q15: curved_to_linear_wkb at maxAngleStep 5.0 then re-typed via
    * get_wkb_geom_type — CurvePolygon→Polygon etc. */
  def q15Linearize(s: SparkSession, dir: String): DataFrame = {
    GeoFunctions.registerAll(s)
    import s.implicits._
    q15Rows.map { case (n, h, _, _) => (n, h) }.toDF("name", "wkb_hex")
      .withColumn("lin", expr("curved_to_linear_wkb(unhex(wkb_hex), 5.0D)"))
      .select(col("name"),
        expr("get_wkb_geom_type(lin)").as("lin_type"),
        col("lin").isNull.as("lin_null"))
      .orderBy("name")
  }

  /** Synthesized rasters with analytically known contour counts at
    * interval 5.0 / base 0.5 (FIXTURES.md §2 — the reference's raster
    * table is Databricks-only, so fixtures are generated in-code). */
  private def rasters: Seq[(String, Array[Byte])] = {
    import graft.geo.GeoTiff
    val ramp = GeoTiff.writeFloat32(16, 16,
      Array.tabulate(16 * 16)(i => (i / 16).toFloat)) // range (0,15) → levels 0.5, 5.5, 10.5
    val cone = GeoTiff.writeFloat32(17, 17, Array.tabulate(17 * 17) { i =>
      val r = i / 17; val c = i % 17
      (20 - 2 * math.max(math.abs(r - 8), math.abs(c - 8))).toFloat
    }) // range (4,20) → 3 levels
    val flat = GeoTiff.writeFloat32(8, 8, Array.fill(64)(5.0f)) // no contours → null
    Seq(("ramp", ramp), ("cone", cone), ("flat", flat))
  }

  /** q26: contour generation over raster binaries — the reference's
    * canonical call shape (`generate_contours_udf(tile_geotiff, i, b)`,
    * `hoydekurver_registration_and_sql_tests.py:85-108`) with the
    * output contract checked numerically. */
  def q26Contours(s: SparkSession, dir: String): DataFrame = {
    GeoFunctions.registerAll(s)
    import s.implicits._
    rasters.toDF("raster_id", "raster")
      // the reference's canonical pre-UDF selection: IN-list filter
      // before the expensive operator (`test_contours_udf.py:31-44`)
      .filter(col("raster_id").isin("ramp", "cone", "flat"))
      .withColumn("contours", expr("generate_contours_udf(raster, 5.0D, 0.5D)"))
      .filter(col("raster").isNotNull)
      .select(col("raster_id"),
        expr("get_wkb_geom_type(contours)").as("geom_type"),
        expr("get_wkb_num_geoms(contours)").as("n_lines"),
        col("contours").isNull.as("is_null"))
      .orderBy("raster_id")
  }

  // ---- q77: spatial grid partitioning over REAL WKB bytes ----
  // One point per document at coordinates that are pure integer
  // functions of doc_id, ENCODED AS REAL WKB and decoded back through
  // the in-repo reader before gridding — so the oracle (which replays
  // only the coordinate arithmetic, never touching WKB) transitively
  // proves the encode → parse → envelope → cell pipeline: any byte
  // off in the codec moves a coordinate and breaks the hash. The cell
  // key is what a 100 TB spatial join shuffles on.
  private val GridCellSize = 10.0

  /** The ONE doc_id → coordinates formula behind every synthesized
    * spatial corpus (points q77/q78/q79, polygon centers q80) — and
    * behind their oracles, which interpolate the same arithmetic. */
  private def xyOf(id: Long): (Double, Double) =
    ((id * 37 % 1000).toDouble / 10.0 - 50.0,
      (id * 91 % 1000).toDouble / 10.0 - 50.0)

  /** The shared synthesized point corpus for q77/q78/q79: coordinates
    * from [[xyOf]], encoded as REAL WKB — one definition so the
    * queries cannot drift apart. */
  private def pointCorpus(s: SparkSession, dir: String): DataFrame = {
    import graft.geo.Wkb
    val enc = udf { (id: Long) =>
      val (x, y) = xyOf(id)
      Wkb.write(Wkb.GPoint(Array(x, y), hasZ = false, hasM = false))
    }
    graft.Tables.documents(s, dir)
      .select(col("doc_id"), enc(col("doc_id")).as("wkb"))
  }

  def q77GeoGrid(s: SparkSession, dir: String): DataFrame = {
    import graft.geo.GeoGrid
    GeoGrid.gridCells(pointCorpus(s, dir), col("wkb"), GridCellSize)
      .groupBy(col("cell_x"), col("cell_y"))
      .agg(count(lit(1)).as("n_geoms"), min(col("doc_id")).as("first_doc"))
  }

  // ---- q78: the grid-partitioned spatial join itself ----
  // Neighbor pairs within 5.0 units over the q77 point corpus: 3×3
  // cell-probe equi-join + exact integer distance verify — the LSH
  // candidate/verify pattern applied to space. The oracle replays the
  // coordinate arithmetic and an O(n²) distance filter, proving the
  // grid join loses no pair and invents none.
  private val NeighborMaxDist = 5.0
  def q78GeoNeighbors(s: SparkSession, dir: String): DataFrame =
    graft.geo.GeoGrid.neighborPairs(pointCorpus(s, dir), col("doc_id"),
      col("wkb"), cellSize = GridCellSize, maxDist = NeighborMaxDist)

  // ---- q79: dense-cell-capped spatial join (the skew-guard twin) ----
  // q78 with maxCellPoints enforced — the q49/q58/q62 pattern for
  // space: the oracle replays the rank-truncation (first cap points
  // per cell by id) before its brute-force distance filter, proving
  // the guard's exact semantics. The cap triggers at BOTH driver SFs
  // (cells hold 2-8 points at sf0.01 and 40-60 at sf0.1).
  private val NeighborCellCap = 6
  def q79GeoNeighborsCapped(s: SparkSession, dir: String): DataFrame =
    graft.geo.GeoGrid.neighborPairs(pointCorpus(s, dir), col("doc_id"),
      col("wkb"), cellSize = GridCellSize, maxDist = NeighborMaxDist,
      maxCellPoints = NeighborCellCap)

  // ---- q80: grid-partitioned containment join (st_contains) ----
  // Every 20th doc carries a REAL WKB rectangle (center from the point
  // formula, half-extent 3.05..7.05 — the .05 keeps every 0.1-grid
  // point strictly off the edges, so the even-odd ray cast and the
  // envelope arithmetic agree unambiguously). The oracle replays the
  // synthesis arithmetic and a brute-force strict range check; the
  // Spark side must encode, parse, grid, prefilter AND ray-cast its
  // way to the identical pair set.
  /** Synthesized rectangle corpus: every doc with `doc_id ≡ residue
    * (mod 20)` carries a REAL WKB rectangle centered on the point
    * formula with half-extent `(doc_id/20 % 5) + extentBase`. The
    * fractional part of extentBase controls edge coordinates mod 0.1:
    * picking DIFFERENT fractions for two corpora (.05 vs .17 → edges
    * at .x5 vs .x3/.x7) guarantees no two edges from different
    * corpora ever coincide, so strict-vs-touching overlap is never
    * ambiguous — the polygon analog of q80's keep-points-off-edges
    * construction. */
  private def rectCorpus(s: SparkSession, dir: String,
      residue: Int, extentBase: Double): DataFrame = {
    import graft.geo.Wkb
    val rectUdf = udf { (id: Long) =>
      val (cx, cy) = xyOf(id)
      val wv = (id / 20 % 5).toDouble + extentBase
      val ring = Array(
        Array(cx - wv, cy - wv), Array(cx + wv, cy - wv),
        Array(cx + wv, cy + wv), Array(cx - wv, cy + wv),
        Array(cx - wv, cy - wv))
      Wkb.write(Wkb.GPolygon(Array(ring), hasZ = false, hasM = false))
    }
    graft.Tables.documents(s, dir)
      .filter(pmod(col("doc_id"), lit(20)) === residue)
      .select(col("doc_id"), rectUdf(col("doc_id")).as("wkb"))
  }

  def q80GeoContainment(s: SparkSession, dir: String): DataFrame =
    graft.geo.GeoGrid.containmentJoin(
      pointCorpus(s, dir), col("doc_id"), col("wkb"),
      rectCorpus(s, dir, residue = 0, extentBase = 3.05),
      col("doc_id"), col("wkb"), GridCellSize)

  // ---- q141: zonal statistics (per-polygon point aggregates) ----
  // The geo workhorse AFTER a containment join: per zone, how many
  // points and what value mass — census counts per admin area, sensor
  // means per management zone. Pairs come from q80's audited
  // containment join; the value is a pure doc_id function so the
  // oracle replays synthesis + brute-force containment + aggregation,
  // and zones with no points survive with zero counts (the left-join
  // contract a reporting layer needs). Integer sums and a floor-mean
  // keep it hash-exact cross-engine.
  def q141ZonalStats(s: SparkSession, dir: String): DataFrame = {
    val polys = rectCorpus(s, dir, residue = 0, extentBase = 3.05)
    val pairs = graft.geo.GeoGrid.containmentJoin(
      pointCorpus(s, dir), col("doc_id"), col("wkb"),
      polys, col("doc_id"), col("wkb"), GridCellSize)
    val vals = pairs
      .select(col("poly_id"), pmod(col("point_id") * 13, lit(1000)).as("v"))
      .groupBy(col("poly_id"))
      .agg(count(lit(1)).as("n_points"), sum(col("v")).as("sum_v"),
        expr("sum(v) div count(1)").as("mean_v_fp"))
    polys.select(col("doc_id").as("poly_id"))
      .join(vals, Seq("poly_id"), "left")
      .select(col("poly_id"),
        coalesce(col("n_points"), lit(0L)).as("n_points"),
        coalesce(col("sum_v"), lit(0L)).as("sum_v"),
        col("mean_v_fp"))
  }

  // ---- q81: grid-partitioned polygon ⋈ polygon overlap (st_intersects) ----
  // The third spatial workhorse over two disjoint rectangle corpora
  // (residues 0 and 10 mod 20; extent fractions .05 vs .17 keep every
  // edge pair strictly apart, so overlap is never edge-touching). For
  // axis-aligned rectangles st_intersects ≡ strict interval overlap
  // on both axes, which the oracle replays brute-force O(n²) — while
  // the Spark side must encode → parse → cell-range-index BOTH sides
  // → fp-prefilter → min-cell-dedup → edge/vertex-verify its way to
  // the identical pair set. Concave/hole geometries, where envelope
  // overlap and st_intersects genuinely differ, are covered by
  // GeoGridSpec (an oracle can't replay a ray cast in SQL).
  def q81GeoOverlap(s: SparkSession, dir: String): DataFrame =
    graft.geo.GeoGrid.overlapJoin(
      rectCorpus(s, dir, residue = 0, extentBase = 3.05),
      col("doc_id"), col("wkb"),
      rectCorpus(s, dir, residue = 10, extentBase = 4.17),
      col("doc_id"), col("wkb"), GridCellSize)

  // ---- q82: shape statistics (st_area-class layer introspection) ----
  // Integer shoelace area over the rectangle corpus: the oracle knows
  // a rect's doubled area is 2·(x1f−x0f)·(y1f−y0f) from the synthesis
  // arithmetic alone, while the Spark side must encode → parse →
  // floor every vertex → translate → shoelace its way to the identical
  // integer. Ring/vertex counts pin the WKB structure.
  def q82GeoShapeStats(s: SparkSession, dir: String): DataFrame =
    graft.geo.GeoStats.shapeStats(
      rectCorpus(s, dir, residue = 0, extentBase = 3.05),
      col("doc_id"), col("wkb"))

  // ---- q85: grid-partitioned point ⋈ linestring distance join ----
  // The snap-to-network workhorse (address → nearest road): every doc
  // with doc_id ≡ 5 (mod 20) carries a REAL WKB two-segment L-shaped
  // polyline anchored on the point formula; the q77 point corpus
  // probes within 2.0 units. The oracle replays the synthesis
  // arithmetic and the clamped-projection predicate brute-force in
  // HUGEINT — the Spark side must encode → parse → segment-index →
  // cell-probe → ownership-dedup → BigInt-verify its way to the same
  // (pair, segment-hit-count) set.
  private val LineMaxDist = 2.0
  private val LineDx = 8.13
  private val LineDy = 6.29
  private def lineCorpus(s: SparkSession, dir: String): DataFrame = {
    import graft.geo.Wkb
    val lineUdf = udf { (id: Long) =>
      val (x, y) = xyOf(id)
      Wkb.write(Wkb.GLineString(Array(
        Array(x, y), Array(x + LineDx, y), Array(x + LineDx, y + LineDy)),
        hasZ = false, hasM = false))
    }
    graft.Tables.documents(s, dir)
      .filter(pmod(col("doc_id"), lit(20)) === 5)
      .select(col("doc_id"), lineUdf(col("doc_id")).as("wkb"))
  }
  def q85GeoLineDistance(s: SparkSession, dir: String): DataFrame =
    graft.geo.GeoGrid.lineDistanceJoin(
      pointCorpus(s, dir), col("doc_id"), col("wkb"),
      lineCorpus(s, dir), col("doc_id"), col("wkb"),
      GridCellSize, LineMaxDist)

  // ---- q86: grid admission audit (the silent-exclusion contract,
  // surfaced) ----
  // The join family rightly DROPS unscorable geometries (null,
  // unparsable, empty, overflow, giant-span) without ceremony; a layer
  // audit needs the ids and reasons. The corpus plants every refusal
  // class by doc_id arithmetic, so the oracle knows each row's reason
  // — and the home cell of the admitted rows — from the synthesis
  // alone, while the Spark side must decode and classify its way to
  // the identical verdict column.
  private def auditCorpus(s: SparkSession, dir: String): DataFrame = {
    import graft.geo.Wkb
    val geomUdf = udf { (id: Long) =>
      (id % 50).toInt match {
        case 1 => null
        case 2 => Array[Byte](9, 9, 9) // no such WKB type
        case 3 => Wkb.write(Wkb.GLineString(Array.empty, hasZ = false, hasM = false))
        case 4 => Wkb.write(Wkb.GPoint(Array(Double.NaN, 1.0), hasZ = false, hasM = false))
        case 5 => Wkb.write(Wkb.GPoint(Array(9.5e12, 0.0), hasZ = false, hasM = false))
        case 6 => Wkb.write(Wkb.GLineString(Array(
          Array(-3.0e7, 0.0), Array(3.0e7, 0.0)), hasZ = false, hasM = false))
        case _ =>
          val (x, y) = xyOf(id)
          Wkb.write(Wkb.GPoint(Array(x, y), hasZ = false, hasM = false))
      }
    }
    graft.Tables.documents(s, dir)
      .select(col("doc_id"), geomUdf(col("doc_id")).as("wkb"))
  }
  def q86GeoGridAudit(s: SparkSession, dir: String): DataFrame =
    graft.geo.GeoGrid.gridAudit(auditCorpus(s, dir),
      col("doc_id"), col("wkb"), GridCellSize)

  // ---- q138: grid-partitioned exact kNN join (snap-to-nearest-POI) ----
  // Every point queries the sparse POI layer (every 20th doc, same
  // coordinate formula) for its 3 nearest neighbors. The POI layer's
  // density (≈1 per 4 cells at sf0.01) forces real ring expansion —
  // most queries cannot retire at the first 3×3 block because the
  // termination proof demands the k-th hit strictly inside the
  // covered radius. The oracle replays the synthesis arithmetic and a
  // brute-force O(n·m) rank — the grid search must produce the
  // identical top-3 per query, ties and all.
  private val KnnK = 3
  private val PoiResidue = 7
  def q138GeoKnn(s: SparkSession, dir: String): DataFrame =
    graft.geo.GeoGrid.knnJoin(
      pointCorpus(s, dir), col("doc_id"), col("wkb"),
      pointCorpus(s, dir).filter(pmod(col("doc_id"), lit(20)) === PoiResidue),
      col("doc_id"), col("wkb"), GridCellSize, KnnK)

  // ---- q139: polygon overlap with intersection AREA (overlay analysis) ----
  // q81's pair discovery upgraded to HOW MUCH: the exact rational
  // Sutherland–Hodgman clip area over the same two rectangle corpora.
  // For axis-aligned rectangles the doubled intersection area is
  // 2·(x-overlap)·(y-overlap) over the floored corners, which the
  // oracle replays brute-force — the Spark side must parse → clip →
  // shoelace its way to the identical integer, with exact=true from
  // the convex path. Concave/rational cases are covered by
  // GeoStatsSpec (SQL can't replay a rational clip).
  def q139GeoOverlapArea(s: SparkSession, dir: String): DataFrame =
    graft.geo.GeoGrid.overlapAreaJoin(
      rectCorpus(s, dir, residue = 0, extentBase = 3.05),
      col("doc_id"), col("wkb"),
      rectCorpus(s, dir, residue = 10, extentBase = 4.17),
      col("doc_id"), col("wkb"), GridCellSize)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q86_geo_grid_audit" -> q86GeoGridAudit _,
    "q138_geo_knn" -> q138GeoKnn _,
    "q139_geo_overlap_area" -> q139GeoOverlapArea _,
    "q141_zonal_stats" -> q141ZonalStats _,
    "q85_geo_line_distance" -> q85GeoLineDistance _,
    "q14_geom_type" -> q14GeomType _,
    "q15_linearize" -> q15Linearize _,
    "q26_contours"  -> q26Contours _,
    "q77_geo_grid"  -> q77GeoGrid _,
    "q78_geo_neighbors" -> q78GeoNeighbors _,
    "q79_geo_neighbors_capped" -> q79GeoNeighborsCapped _,
    "q80_geo_containment" -> q80GeoContainment _,
    "q81_geo_overlap" -> q81GeoOverlap _,
    "q82_geo_shape_stats" -> q82GeoShapeStats _,
  )

  /** HUGEINT replay of GeoGrid.segWithinFp: clamped-projection
    * point-to-segment distance predicate over micro-unit integers. */
  private def segWithinSql(px: String, py: String, ax: String, ay: String,
      bx: String, by: String): String = {
    val apx = s"($px - $ax)"; val apy = s"($py - $ay)"
    val abx = s"($bx - $ax)"; val aby = s"($by - $ay)"
    val bpx = s"($px - $bx)"; val bpy = s"($py - $by)"
    val td = s"($abx*$abx + $aby*$aby)"
    val tn = s"($apx*$abx + $apy*$aby)"
    val cross = s"($abx*$apy - $aby*$apx)"
    val fp = math.floor(LineMaxDist * 1e6).toLong
    val r2 = s"(CAST($fp AS HUGEINT) * $fp)"
    s"(CASE WHEN $td = 0 OR $tn <= 0 THEN $apx*$apx + $apy*$apy <= $r2 " +
      s"WHEN $tn >= $td THEN $bpx*$bpx + $bpy*$bpy <= $r2 " +
      s"ELSE $cross*$cross <= $r2*$td END)"
  }

  val oracleSql: Map[String, String] = Map(
    // brute-force O(n·m) kNN replay under the same micro-unit integer
    // arithmetic and (dist2, id) tie order the grid search uses — the
    // expanding-ring termination must lose no neighbor and invent none
    "q138_geo_knn" ->
      s"""WITH p AS (SELECT doc_id,
         |    CAST(floor((((x + x) / 2.0)) * 1000000.0) AS BIGINT) AS xf,
         |    CAST(floor((((y + y) / 2.0)) * 1000000.0) AS BIGINT) AS yf
         |  FROM (SELECT doc_id,
         |    CAST(doc_id * 37 % 1000 AS DOUBLE) / 10.0 - 50.0 AS x,
         |    CAST(doc_id * 91 % 1000 AS DOUBLE) / 10.0 - 50.0 AS y FROM documents) s),
         |poi AS (SELECT doc_id AS neighbor_id, xf, yf FROM p
         |  WHERE doc_id % 20 = $PoiResidue),
         |d AS (SELECT p.doc_id AS query_id, poi.neighbor_id,
         |    (p.xf - poi.xf) * (p.xf - poi.xf)
         |      + (p.yf - poi.yf) * (p.yf - poi.yf) AS dist2_fp2
         |  FROM p, poi),
         |r AS (SELECT query_id, neighbor_id, dist2_fp2, row_number() OVER (
         |    PARTITION BY query_id ORDER BY dist2_fp2, neighbor_id) AS rn FROM d)
         |SELECT query_id, neighbor_id, dist2_fp2, CAST(rn AS BIGINT) AS nn_rank
         |FROM r WHERE rn <= $KnnK""".stripMargin,
    // q80's brute-force containment replay + per-zone aggregation over
    // the synthesized value column; zero-point zones ride the left join
    "q141_zonal_stats" ->
      s"""WITH pt AS (SELECT doc_id AS point_id,
         |    CAST(floor((CAST(doc_id * 37 % 1000 AS DOUBLE) / 10.0 - 50.0)
         |      * 1000000.0) AS BIGINT) AS pxf,
         |    CAST(floor((CAST(doc_id * 91 % 1000 AS DOUBLE) / 10.0 - 50.0)
         |      * 1000000.0) AS BIGINT) AS pyf FROM documents),
         |pg AS (SELECT doc_id AS poly_id,
         |    CAST(doc_id * 37 % 1000 AS DOUBLE) / 10.0 - 50.0 AS cx,
         |    CAST(doc_id * 91 % 1000 AS DOUBLE) / 10.0 - 50.0 AS cy,
         |    CAST(doc_id // 20 % 5 AS DOUBLE) + 3.05 AS wv
         |  FROM documents WHERE doc_id % 20 = 0),
         |pb AS (SELECT poly_id,
         |    CAST(floor((cx - wv) * 1000000.0) AS BIGINT) AS x0f,
         |    CAST(floor((cx + wv) * 1000000.0) AS BIGINT) AS x1f,
         |    CAST(floor((cy - wv) * 1000000.0) AS BIGINT) AS y0f,
         |    CAST(floor((cy + wv) * 1000000.0) AS BIGINT) AS y1f FROM pg),
         |pr AS (SELECT pt.point_id, pb.poly_id FROM pt, pb
         |  WHERE pt.pxf > pb.x0f AND pt.pxf < pb.x1f
         |    AND pt.pyf > pb.y0f AND pt.pyf < pb.y1f),
         |ag AS (SELECT poly_id, CAST(count(*) AS BIGINT) AS n_points,
         |    CAST(sum(point_id * 13 % 1000) AS BIGINT) AS sum_v,
         |    CAST(sum(point_id * 13 % 1000) // count(*) AS BIGINT) AS mean_v_fp
         |  FROM pr GROUP BY poly_id)
         |SELECT pg.poly_id, coalesce(ag.n_points, 0) AS n_points,
         |  coalesce(ag.sum_v, 0) AS sum_v, ag.mean_v_fp
         |FROM pg LEFT JOIN ag USING (poly_id)""".stripMargin,
    // q81's brute-force overlap replay extended with the doubled
    // rectangle-intersection area over the same floored-corner fp
    // arithmetic the clip must reproduce
    "q139_geo_overlap_area" ->
      s"""WITH ca AS (SELECT doc_id AS id_a,
         |    CAST(doc_id * 37 % 1000 AS DOUBLE) / 10.0 - 50.0 AS cx,
         |    CAST(doc_id * 91 % 1000 AS DOUBLE) / 10.0 - 50.0 AS cy,
         |    CAST(doc_id // 20 % 5 AS DOUBLE) + 3.05 AS wv
         |  FROM documents WHERE doc_id % 20 = 0),
         |cb AS (SELECT doc_id AS id_b,
         |    CAST(doc_id * 37 % 1000 AS DOUBLE) / 10.0 - 50.0 AS cx,
         |    CAST(doc_id * 91 % 1000 AS DOUBLE) / 10.0 - 50.0 AS cy,
         |    CAST(doc_id // 20 % 5 AS DOUBLE) + 4.17 AS wv
         |  FROM documents WHERE doc_id % 20 = 10),
         |ba AS (SELECT id_a,
         |    CAST(floor((cx - wv) * 1000000.0) AS BIGINT) AS x0f,
         |    CAST(floor((cx + wv) * 1000000.0) AS BIGINT) AS x1f,
         |    CAST(floor((cy - wv) * 1000000.0) AS BIGINT) AS y0f,
         |    CAST(floor((cy + wv) * 1000000.0) AS BIGINT) AS y1f FROM ca),
         |bb AS (SELECT id_b,
         |    CAST(floor((cx - wv) * 1000000.0) AS BIGINT) AS x0f,
         |    CAST(floor((cx + wv) * 1000000.0) AS BIGINT) AS x1f,
         |    CAST(floor((cy - wv) * 1000000.0) AS BIGINT) AS y0f,
         |    CAST(floor((cy + wv) * 1000000.0) AS BIGINT) AS y1f FROM cb)
         |SELECT ba.id_a, bb.id_b,
         |  2 * (least(ba.x1f, bb.x1f) - greatest(ba.x0f, bb.x0f))
         |    * (least(ba.y1f, bb.y1f) - greatest(ba.y0f, bb.y0f)) AS area2_fp2,
         |  true AS exact FROM ba, bb
         |WHERE ba.x0f < bb.x1f AND bb.x0f < ba.x1f
         |  AND ba.y0f < bb.y1f AND bb.y0f < ba.y1f""".stripMargin,
    "q86_geo_grid_audit" ->
      s"""SELECT doc_id AS id,
         |  CASE doc_id % 50
         |    WHEN 1 THEN 'null_wkb'
         |    WHEN 2 THEN 'unparsable'
         |    WHEN 3 THEN 'empty_or_nan'
         |    WHEN 4 THEN 'empty_or_nan'
         |    WHEN 5 THEN 'coord_overflow'
         |    WHEN 6 THEN 'span_exceeded'
         |    ELSE 'ok' END AS reason,
         |  CASE WHEN doc_id % 50 IN (1, 2, 3, 4, 5, 6) THEN NULL
         |    ELSE CAST(floor(((x + x) / 2.0) / $GridCellSize) AS BIGINT) END AS cell_x,
         |  CASE WHEN doc_id % 50 IN (1, 2, 3, 4, 5, 6) THEN NULL
         |    ELSE CAST(floor(((y + y) / 2.0) / $GridCellSize) AS BIGINT) END AS cell_y
         |FROM (SELECT doc_id,
         |  CAST(doc_id * 37 % 1000 AS DOUBLE) / 10.0 - 50.0 AS x,
         |  CAST(doc_id * 91 % 1000 AS DOUBLE) / 10.0 - 50.0 AS y FROM documents) s""".stripMargin,
    "q85_geo_line_distance" -> {
      val s1 = segWithinSql("pt.px", "pt.py", "ln.ax1", "ln.ay1", "ln.ax2", "ln.ay2")
      val s2 = segWithinSql("pt.px", "pt.py", "ln.ax2", "ln.ay2", "ln.ax3", "ln.ay3")
      s"""WITH pt AS (SELECT doc_id AS point_id,
         |    CAST(floor(((x + x) / 2.0) * 1000000.0) AS HUGEINT) AS px,
         |    CAST(floor(((y + y) / 2.0) * 1000000.0) AS HUGEINT) AS py
         |  FROM (SELECT doc_id,
         |    CAST(doc_id * 37 % 1000 AS DOUBLE) / 10.0 - 50.0 AS x,
         |    CAST(doc_id * 91 % 1000 AS DOUBLE) / 10.0 - 50.0 AS y FROM documents) s),
         |ln AS (SELECT doc_id AS line_id,
         |    CAST(floor(x * 1000000.0) AS HUGEINT) AS ax1,
         |    CAST(floor(y * 1000000.0) AS HUGEINT) AS ay1,
         |    CAST(floor((x + $LineDx) * 1000000.0) AS HUGEINT) AS ax2,
         |    CAST(floor(y * 1000000.0) AS HUGEINT) AS ay2,
         |    CAST(floor((x + $LineDx) * 1000000.0) AS HUGEINT) AS ax3,
         |    CAST(floor((y + $LineDy) * 1000000.0) AS HUGEINT) AS ay3
         |  FROM (SELECT doc_id,
         |    CAST(doc_id * 37 % 1000 AS DOUBLE) / 10.0 - 50.0 AS x,
         |    CAST(doc_id * 91 % 1000 AS DOUBLE) / 10.0 - 50.0 AS y FROM documents) s
         |  WHERE doc_id % 20 = 5),
         |j AS (SELECT pt.point_id, ln.line_id,
         |    CAST($s1 AS INTEGER) + CAST($s2 AS INTEGER) AS n_seg_hits
         |  FROM pt, ln)
         |SELECT point_id, line_id, CAST(n_seg_hits AS BIGINT) AS n_seg_hits
         |FROM j WHERE n_seg_hits > 0""".stripMargin
    },
    "q14_geom_type" ->
      ("SELECT * FROM (VALUES " +
        WkbCorpus.cases.map { case (n, _, e) => s"('$n','$e','$e')" }.mkString(", ") +
        ") AS t(name, geom_type, geom_type_hex) ORDER BY name"),
    "q15_linearize" ->
      ("SELECT * FROM (VALUES " +
        q15Rows.map { case (n, _, lin, isNull) => s"('$n','$lin',$isNull)" }.mkString(", ") +
        ") AS t(name, lin_type, lin_null) ORDER BY name"),
    "q26_contours" ->
      ("""SELECT * FROM (VALUES
         | ('cone', 'MultiLineString', CAST(3 AS BIGINT), false),
         | ('flat', 'Invalid (null input)', CAST(NULL AS BIGINT), true),
         | ('ramp', 'MultiLineString', CAST(3 AS BIGINT), false)
         |) AS t(raster_id, geom_type, n_lines, is_null) ORDER BY raster_id""".stripMargin),
    // replays ONLY the coordinate arithmetic (identical IEEE op order)
    // — the WKB encode/parse/envelope path is what the equality proves
    "q77_geo_grid" ->
      s"""WITH p AS (SELECT doc_id,
         |    CAST(doc_id * 37 % 1000 AS DOUBLE) / 10.0 - 50.0 AS x,
         |    CAST(doc_id * 91 % 1000 AS DOUBLE) / 10.0 - 50.0 AS y FROM documents),
         |c AS (SELECT doc_id,
         |    CAST(floor(((x + x) / 2.0) / $GridCellSize) AS BIGINT) AS cell_x,
         |    CAST(floor(((y + y) / 2.0) / $GridCellSize) AS BIGINT) AS cell_y FROM p)
         |SELECT cell_x, cell_y, count(*) AS n_geoms, min(doc_id) AS first_doc
         |FROM c GROUP BY cell_x, cell_y""".stripMargin,
    // brute-force O(n²) replay at oracle scale: every pair the grid
    // join returns, no more and no fewer, under the same micro-unit
    // integer distance arithmetic
    "q78_geo_neighbors" ->
      s"""WITH p AS (SELECT doc_id,
         |    CAST(floor((((x + x) / 2.0)) * 1000000.0) AS BIGINT) AS xf,
         |    CAST(floor((((y + y) / 2.0)) * 1000000.0) AS BIGINT) AS yf
         |  FROM (SELECT doc_id,
         |    CAST(doc_id * 37 % 1000 AS DOUBLE) / 10.0 - 50.0 AS x,
         |    CAST(doc_id * 91 % 1000 AS DOUBLE) / 10.0 - 50.0 AS y FROM documents) s)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  (a.xf - b.xf) * (a.xf - b.xf) + (a.yf - b.yf) * (a.yf - b.yf) AS dist2_fp2
         |FROM p a JOIN p b ON a.doc_id < b.doc_id
         |WHERE (a.xf - b.xf) * (a.xf - b.xf) + (a.yf - b.yf) * (a.yf - b.yf)
         |  <= CAST(${math.floor(NeighborMaxDist * 1e6).toLong} AS BIGINT)
         |     * CAST(${math.floor(NeighborMaxDist * 1e6).toLong} AS BIGINT)""".stripMargin,
    // same brute-force replay over only the rank-truncation survivors
    // — the windowed cap IS the semantics under test
    "q79_geo_neighbors_capped" ->
      s"""WITH p0 AS (SELECT doc_id,
         |    CAST(floor((((x + x) / 2.0)) * 1000000.0) AS BIGINT) AS xf,
         |    CAST(floor((((y + y) / 2.0)) * 1000000.0) AS BIGINT) AS yf,
         |    CAST(floor(((x + x) / 2.0) / $GridCellSize) AS BIGINT) AS cx,
         |    CAST(floor(((y + y) / 2.0) / $GridCellSize) AS BIGINT) AS cy
         |  FROM (SELECT doc_id,
         |    CAST(doc_id * 37 % 1000 AS DOUBLE) / 10.0 - 50.0 AS x,
         |    CAST(doc_id * 91 % 1000 AS DOUBLE) / 10.0 - 50.0 AS y FROM documents) s),
         |p AS (SELECT doc_id, xf, yf FROM (SELECT doc_id, xf, yf,
         |    row_number() OVER (PARTITION BY cx, cy ORDER BY doc_id) AS rn FROM p0) t
         |  WHERE rn <= $NeighborCellCap)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  (a.xf - b.xf) * (a.xf - b.xf) + (a.yf - b.yf) * (a.yf - b.yf) AS dist2_fp2
         |FROM p a JOIN p b ON a.doc_id < b.doc_id
         |WHERE (a.xf - b.xf) * (a.xf - b.xf) + (a.yf - b.yf) * (a.yf - b.yf)
         |  <= CAST(${math.floor(NeighborMaxDist * 1e6).toLong} AS BIGINT)
         |     * CAST(${math.floor(NeighborMaxDist * 1e6).toLong} AS BIGINT)""".stripMargin,
    // synthesis arithmetic + brute-force strict range check; the Spark
    // side reaches the same pairs only if WKB encode → parse →
    // envelope → grid → ray cast all agree with this arithmetic
    "q80_geo_containment" ->
      s"""WITH pt AS (SELECT doc_id AS point_id,
         |    CAST(floor((CAST(doc_id * 37 % 1000 AS DOUBLE) / 10.0 - 50.0)
         |      * 1000000.0) AS BIGINT) AS pxf,
         |    CAST(floor((CAST(doc_id * 91 % 1000 AS DOUBLE) / 10.0 - 50.0)
         |      * 1000000.0) AS BIGINT) AS pyf FROM documents),
         |pg AS (SELECT doc_id AS poly_id,
         |    CAST(doc_id * 37 % 1000 AS DOUBLE) / 10.0 - 50.0 AS cx,
         |    CAST(doc_id * 91 % 1000 AS DOUBLE) / 10.0 - 50.0 AS cy,
         |    CAST(doc_id // 20 % 5 AS DOUBLE) + 3.05 AS wv
         |  FROM documents WHERE doc_id % 20 = 0),
         |pb AS (SELECT poly_id,
         |    CAST(floor((cx - wv) * 1000000.0) AS BIGINT) AS x0f,
         |    CAST(floor((cx + wv) * 1000000.0) AS BIGINT) AS x1f,
         |    CAST(floor((cy - wv) * 1000000.0) AS BIGINT) AS y0f,
         |    CAST(floor((cy + wv) * 1000000.0) AS BIGINT) AS y1f FROM pg)
         |SELECT pt.point_id, pb.poly_id FROM pt, pb
         |WHERE pt.pxf > pb.x0f AND pt.pxf < pb.x1f
         |  AND pt.pyf > pb.y0f AND pt.pyf < pb.y1f""".stripMargin,
    // brute-force O(n²) rectangle overlap: for axis-aligned rectangles
    // st_intersects ≡ strict interval overlap per axis, replayed here
    // in the same fp micro-unit arithmetic; the corpus construction
    // (edge fractions .x5 vs .x3/.x7) keeps strict and inclusive
    // compares equivalent, so the Spark side's inclusive prefilter +
    // exact edge/vertex verify must land on the identical pair set
    "q81_geo_overlap" ->
      s"""WITH ca AS (SELECT doc_id AS id_a,
         |    CAST(doc_id * 37 % 1000 AS DOUBLE) / 10.0 - 50.0 AS cx,
         |    CAST(doc_id * 91 % 1000 AS DOUBLE) / 10.0 - 50.0 AS cy,
         |    CAST(doc_id // 20 % 5 AS DOUBLE) + 3.05 AS wv
         |  FROM documents WHERE doc_id % 20 = 0),
         |cb AS (SELECT doc_id AS id_b,
         |    CAST(doc_id * 37 % 1000 AS DOUBLE) / 10.0 - 50.0 AS cx,
         |    CAST(doc_id * 91 % 1000 AS DOUBLE) / 10.0 - 50.0 AS cy,
         |    CAST(doc_id // 20 % 5 AS DOUBLE) + 4.17 AS wv
         |  FROM documents WHERE doc_id % 20 = 10),
         |ba AS (SELECT id_a,
         |    CAST(floor((cx - wv) * 1000000.0) AS BIGINT) AS x0f,
         |    CAST(floor((cx + wv) * 1000000.0) AS BIGINT) AS x1f,
         |    CAST(floor((cy - wv) * 1000000.0) AS BIGINT) AS y0f,
         |    CAST(floor((cy + wv) * 1000000.0) AS BIGINT) AS y1f FROM ca),
         |bb AS (SELECT id_b,
         |    CAST(floor((cx - wv) * 1000000.0) AS BIGINT) AS x0f,
         |    CAST(floor((cx + wv) * 1000000.0) AS BIGINT) AS x1f,
         |    CAST(floor((cy - wv) * 1000000.0) AS BIGINT) AS y0f,
         |    CAST(floor((cy + wv) * 1000000.0) AS BIGINT) AS y1f FROM cb)
         |SELECT ba.id_a, bb.id_b FROM ba, bb
         |WHERE ba.x0f < bb.x1f AND bb.x0f < ba.x1f
         |  AND ba.y0f < bb.y1f AND bb.y0f < ba.y1f""".stripMargin,
    // a rectangle's doubled shoelace area over floored corners is
    // exactly 2·(x1f−x0f)·(y1f−y0f) — the Spark side must reproduce
    // that integer through WKB encode → parse → floor → translate →
    // shoelace; counts pin the ring structure (1 ring, 5 vertices
    // with the closing duplicate)
    "q82_geo_shape_stats" ->
      s"""WITH pg AS (SELECT doc_id AS poly_id,
         |    CAST(doc_id * 37 % 1000 AS DOUBLE) / 10.0 - 50.0 AS cx,
         |    CAST(doc_id * 91 % 1000 AS DOUBLE) / 10.0 - 50.0 AS cy,
         |    CAST(doc_id // 20 % 5 AS DOUBLE) + 3.05 AS wv
         |  FROM documents WHERE doc_id % 20 = 0),
         |pb AS (SELECT poly_id,
         |    CAST(floor((cx - wv) * 1000000.0) AS BIGINT) AS x0f,
         |    CAST(floor((cx + wv) * 1000000.0) AS BIGINT) AS x1f,
         |    CAST(floor((cy - wv) * 1000000.0) AS BIGINT) AS y0f,
         |    CAST(floor((cy + wv) * 1000000.0) AS BIGINT) AS y1f FROM pg)
         |SELECT poly_id, CAST(1 AS BIGINT) AS n_rings,
         |  CAST(5 AS BIGINT) AS n_vertices,
         |  2 * (x1f - x0f) * (y1f - y0f) AS area2_fp2 FROM pb""".stripMargin,
  )
}
