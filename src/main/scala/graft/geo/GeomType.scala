package graft.geo

/** WKB geometry-type naming — the engine's equivalent of the
  * reference's `get_wkb_geom_type` scalar
  * (`/root/reference/src/dask_felleskomponenter/udfs/udf_tools.py:12-107`):
  * 5-byte header decode → type name + " Z"/" M"/" ZM" dimensionality
  * suffix, with the exact `Invalid (…)` / `Unknown(…)` diagnostics.
  */
object GeomType {

  /** SQL-MM / ISO 19125 type-id table, including the curved and exotic
    * entries the reference recognizes (`udf_tools.py:12-40`). */
  val names: Map[Int, String] = Map(
    0    -> "Geometry",
    1    -> "Point",
    2    -> "LineString",
    3    -> "Polygon",
    4    -> "MultiPoint",
    5    -> "MultiLineString",
    6    -> "MultiPolygon",
    7    -> "GeometryCollection",
    8    -> "CircularString",
    9    -> "CompoundCurve",
    10   -> "CurvePolygon",
    11   -> "MultiCurve",
    12   -> "MultiSurface",
    13   -> "Curve",
    14   -> "Surface",
    15   -> "PolyhedralSurface",
    16   -> "TIN",
    17   -> "Triangle",
    18   -> "Circle",
    19   -> "GeodesicString",
    20   -> "EllipticalCurve",
    21   -> "NurbsCurve",
    22   -> "Clothoid",
    23   -> "SpiralCurve",
    24   -> "CompoundSurface",
    102  -> "AffinePlacement",
    1025 -> "BrepSolid",
  )

  /** Geometry type name of a WKB/EWKB byte array. Total function:
    * diagnostics instead of exceptions. */
  def ofBytes(wkb: Array[Byte]): String = {
    if (wkb == null) return "Invalid (null input)"
    if (wkb.length < 5) return "Invalid (too short)"
    val h = Wkb.parseHeader(wkb).get
    val suffix =
      if (h.hasZ && h.hasM) " ZM"
      else if (h.hasZ) " Z"
      else if (h.hasM) " M"
      else ""
    names.getOrElse(h.baseType, s"Unknown(${h.baseType})") + suffix
  }

  /** Same, accepting a hex-string encoding of the WKB. */
  def ofHex(hex: String): String = {
    if (hex == null) return "Invalid (null input)"
    Wkb.fromHex(hex) match {
      case Some(b) => ofBytes(b)
      case None    => "Invalid (not hex)"
    }
  }
}
