package graft.geo

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable.ArrayBuffer

/** WKB / EWKB codec: header algebra, hex codec, and a full
  * reader/writer for the geometry types the engine manipulates
  * (linear types 1–7 plus the curved types 8–12 that linearization
  * consumes).
  *
  * Semantics follow the reference's byte-level contract
  * (`/root/reference/src/dask_felleskomponenter/udfs/udf_tools.py:43-107`,
  * `udfs/udf_conversions.py:9-44`): EWKB flag bits Z=0x80000000,
  * M=0x40000000, SRID=0x20000000; ISO offsets 1000/2000/3000 for
  * Z/M/ZM; byte 0 selects endianness (0 = big, anything else little).
  *
  * Pure JVM code with no Spark dependency — shared by the UDFs, the
  * Catalyst expression, and the contour/linearize generators, and
  * cheap enough to run per-row inside whole-stage codegen.
  */
object Wkb {

  val EwkbZ: Long    = 0x80000000L
  val EwkbM: Long    = 0x40000000L
  val EwkbSrid: Long = 0x20000000L
  val EwkbMask: Long = EwkbZ | EwkbM | EwkbSrid

  // ---------------- hex ----------------

  /** Python-`bytes.fromhex`-compatible decode: ASCII spaces allowed,
    * odd length or non-hex digit → None. */
  def fromHex(s: String): Option[Array[Byte]] = {
    if (s == null) return None
    val compact = s.filterNot(_ == ' ')
    if (compact.length % 2 != 0) return None
    val out = new Array[Byte](compact.length / 2)
    var i = 0
    while (i < out.length) {
      val hi = Character.digit(compact.charAt(2 * i), 16)
      val lo = Character.digit(compact.charAt(2 * i + 1), 16)
      if (hi < 0 || lo < 0) return None
      out(i) = ((hi << 4) | lo).toByte
      i += 1
    }
    Some(out)
  }

  def toHex(b: Array[Byte]): String = {
    val sb = new StringBuilder(b.length * 2)
    b.foreach(x => sb.append(f"${x & 0xff}%02x"))
    sb.toString
  }

  // ---------------- header ----------------

  /** Decoded 5-byte WKB/EWKB header. `baseType` has EWKB flags and ISO
    * offsets stripped; `hasZ`/`hasM` unify both encodings. */
  final case class Header(
      littleEndian: Boolean,
      rawType: Long,
      baseType: Int,
      hasZ: Boolean,
      hasM: Boolean,
      hasSrid: Boolean) {
    def dims: Int = 2 + (if (hasZ) 1 else 0) + (if (hasM) 1 else 0)
  }

  /** Parse the 5-byte header at `pos`. Returns None if fewer than 5
    * bytes remain. */
  def parseHeader(bytes: Array[Byte], pos: Int = 0): Option[Header] = {
    if (bytes == null || bytes.length - pos < 5) return None
    val little = bytes(pos) != 0
    var raw = 0L
    if (little) {
      raw = (bytes(pos + 1) & 0xffL) | ((bytes(pos + 2) & 0xffL) << 8) |
        ((bytes(pos + 3) & 0xffL) << 16) | ((bytes(pos + 4) & 0xffL) << 24)
    } else {
      raw = ((bytes(pos + 1) & 0xffL) << 24) | ((bytes(pos + 2) & 0xffL) << 16) |
        ((bytes(pos + 3) & 0xffL) << 8) | (bytes(pos + 4) & 0xffL)
    }
    var base = raw
    var hasZ = false; var hasM = false; var hasSrid = false
    if ((raw & EwkbMask) != 0) {
      hasZ = (raw & EwkbZ) != 0
      hasM = (raw & EwkbM) != 0
      hasSrid = (raw & EwkbSrid) != 0
      base = raw & ~EwkbMask
    } else if (raw >= 3000 && raw < 4000) { hasZ = true; hasM = true; base = raw - 3000 }
    else if (raw >= 2000 && raw < 3000) { hasM = true; base = raw - 2000 }
    else if (raw >= 1000 && raw < 2000) { hasZ = true; base = raw - 1000 }
    Some(Header(little, raw, base.toInt, hasZ, hasM, hasSrid))
  }

  /** EWKB → standard WKB: if the SRID flag is set in the (≥9-byte)
    * header, clear it and drop the 4-byte SRID that follows; otherwise
    * return the input unchanged (reference semantics,
    * `udf_conversions.py:24-44`). */
  def stripSrid(bytes: Array[Byte]): Array[Byte] = {
    if (bytes == null || bytes.length < 9) return bytes
    parseHeader(bytes) match {
      case Some(h) if h.hasSrid =>
        val newType = h.rawType & ~EwkbSrid
        val out = new Array[Byte](bytes.length - 4)
        out(0) = bytes(0)
        val bb = ByteBuffer.wrap(out, 1, 4)
          .order(if (h.littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
        bb.putInt(newType.toInt)
        System.arraycopy(bytes, 9, out, 5, bytes.length - 9)
        out
      case _ => bytes
    }
  }

  // ---------------- geometry model ----------------

  /** Minimal geometry AST. Coordinates are flat `Array[Double]` of
    * length `dims` per point; Z then M follow X,Y in WKB order. */
  sealed trait Geom { def hasZ: Boolean; def hasM: Boolean }
  final case class GPoint(coord: Array[Double], hasZ: Boolean, hasM: Boolean) extends Geom
  final case class GLineString(pts: Array[Array[Double]], hasZ: Boolean, hasM: Boolean) extends Geom
  final case class GPolygon(rings: Array[Array[Array[Double]]], hasZ: Boolean, hasM: Boolean) extends Geom
  final case class GMultiPoint(geoms: Array[GPoint], hasZ: Boolean, hasM: Boolean) extends Geom
  final case class GMultiLineString(geoms: Array[GLineString], hasZ: Boolean, hasM: Boolean) extends Geom
  final case class GMultiPolygon(geoms: Array[GPolygon], hasZ: Boolean, hasM: Boolean) extends Geom
  final case class GCollection(geoms: Array[Geom], hasZ: Boolean, hasM: Boolean) extends Geom
  /** Curved types (SQL-MM): arcs defined by consecutive point triples. */
  final case class GCircularString(pts: Array[Array[Double]], hasZ: Boolean, hasM: Boolean) extends Geom
  /** Segments are GLineString or GCircularString, chained end-to-end. */
  final case class GCompoundCurve(segs: Array[Geom], hasZ: Boolean, hasM: Boolean) extends Geom
  /** Rings are GLineString, GCircularString or GCompoundCurve. */
  final case class GCurvePolygon(rings: Array[Geom], hasZ: Boolean, hasM: Boolean) extends Geom
  final case class GMultiCurve(geoms: Array[Geom], hasZ: Boolean, hasM: Boolean) extends Geom
  final case class GMultiSurface(geoms: Array[Geom], hasZ: Boolean, hasM: Boolean) extends Geom

  def typeId(g: Geom): Int = g match {
    case _: GPoint           => 1
    case _: GLineString      => 2
    case _: GPolygon         => 3
    case _: GMultiPoint      => 4
    case _: GMultiLineString => 5
    case _: GMultiPolygon    => 6
    case _: GCollection      => 7
    case _: GCircularString  => 8
    case _: GCompoundCurve   => 9
    case _: GCurvePolygon    => 10
    case _: GMultiCurve      => 11
    case _: GMultiSurface    => 12
  }

  // ---------------- reader ----------------

  private final class Reader(bytes: Array[Byte]) {
    private var pos = 0
    private var bb: ByteBuffer = _

    private def setOrder(little: Boolean): Unit = {
      bb = ByteBuffer.wrap(bytes)
        .order(if (little) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    }
    private def u32(): Long = { val v = bb.getInt(pos).toLong & 0xffffffffL; pos += 4; v }
    private def f64(): Double = { val v = bb.getDouble(pos); pos += 8; v }

    /** Element count, bounds-checked against the bytes remaining: a
      * corrupt/hostile u32 near 2^32 would otherwise drive a multi-GB
      * `Array.fill` whose OutOfMemoryError (an Error, not Exception)
      * escapes `Wkb.read`'s catch and kills the executor. Each element
      * occupies at least `minElementBytes`, so any valid count is
      * bounded by remaining/minElementBytes. */
    private def count(minElementBytes: Int): Int = {
      val n = u32()
      val remaining = bytes.length - pos
      if (n < 0 || n * minElementBytes > remaining)
        throw new IllegalArgumentException(
          s"WKB element count $n exceeds remaining $remaining bytes")
      n.toInt
    }

    def readGeom(): Geom = {
      val h = parseHeader(bytes, pos).getOrElse(throw new IllegalArgumentException("truncated WKB header"))
      setOrder(h.littleEndian)
      pos += 5
      if (h.hasSrid) pos += 4 // skip embedded SRID
      val dims = h.dims
      def point(): Array[Double] = Array.fill(dims)(f64())
      def pointSeq(): Array[Array[Double]] = {
        val n = count(dims * 8)
        Array.fill(n)(point())
      }
      def rings(): Array[Array[Array[Double]]] = {
        val n = count(4) // a ring is at minimum its own u32 point count
        Array.fill(n)(pointSeq())
      }
      h.baseType match {
        case 1 => GPoint(point(), h.hasZ, h.hasM)
        case 2 => GLineString(pointSeq(), h.hasZ, h.hasM)
        case 3 => GPolygon(rings(), h.hasZ, h.hasM)
        case 4 =>
          val n = count(5) // nested geom: >=5-byte header each
          GMultiPoint(Array.fill(n)(readGeom().asInstanceOf[GPoint]), h.hasZ, h.hasM)
        case 5 =>
          val n = count(5) // nested geom: >=5-byte header each
          GMultiLineString(Array.fill(n)(readGeom().asInstanceOf[GLineString]), h.hasZ, h.hasM)
        case 6 =>
          val n = count(5) // nested geom: >=5-byte header each
          GMultiPolygon(Array.fill(n)(readGeom().asInstanceOf[GPolygon]), h.hasZ, h.hasM)
        case 7 =>
          val n = count(5) // nested geom: >=5-byte header each
          GCollection(Array.fill(n)(readGeom()), h.hasZ, h.hasM)
        case 8 => GCircularString(pointSeq(), h.hasZ, h.hasM)
        case 9 =>
          val n = count(5) // nested geom: >=5-byte header each
          GCompoundCurve(Array.fill(n)(readGeom()), h.hasZ, h.hasM)
        case 10 =>
          val n = count(5) // nested geom: >=5-byte header each
          GCurvePolygon(Array.fill(n)(readGeom()), h.hasZ, h.hasM)
        case 11 =>
          val n = count(5) // nested geom: >=5-byte header each
          GMultiCurve(Array.fill(n)(readGeom()), h.hasZ, h.hasM)
        case 12 =>
          val n = count(5) // nested geom: >=5-byte header each
          GMultiSurface(Array.fill(n)(readGeom()), h.hasZ, h.hasM)
        case t => throw new IllegalArgumentException(s"unsupported WKB type $t")
      }
    }
  }

  /** Parse a full WKB/EWKB geometry. None on any structural error. */
  def read(bytes: Array[Byte]): Option[Geom] =
    try Some(new Reader(bytes).readGeom())
    catch { case _: Exception => None }

  // ---------------- writer ----------------

  /** Serialize a geometry to little-endian ISO WKB (Z/M via the
    * 1000/2000/3000 offsets, matching OGR's ExportToWkb output shape). */
  def write(g: Geom): Array[Byte] = {
    val out = new ArrayBuffer[Byte](64)
    writeInto(out, g, ewkb = false, srid = None)
    out.toArray
  }

  /** Serialize to little-endian EWKB, PostGIS dialect: Z/M as flag
    * bits on every header, the SRID flag + embedded SRID on the
    * outermost geometry only — the byte shape `ST_GeomFromWKB` and the
    * sync path's PostGIS target expect. */
  def writeEwkb(g: Geom, srid: Int): Array[Byte] = {
    val out = new ArrayBuffer[Byte](64)
    writeInto(out, g, ewkb = true, srid = Some(srid))
    out.toArray
  }

  private def writeInto(out: ArrayBuffer[Byte], g: Geom,
      ewkb: Boolean, srid: Option[Int]): Unit = {
    out += 1 // little endian
    val header: Long =
      if (ewkb)
        typeId(g).toLong |
          (if (g.hasZ) EwkbZ else 0L) | (if (g.hasM) EwkbM else 0L) |
          (if (srid.isDefined) EwkbSrid else 0L)
      else
        typeId(g).toLong +
          (if (g.hasZ && g.hasM) 3000 else if (g.hasM) 2000 else if (g.hasZ) 1000 else 0)
    putU32(out, header)
    srid.foreach(s => putU32(out, s.toLong & 0xffffffffL))
    def putPoint(c: Array[Double]): Unit = c.foreach(putF64(out, _))
    def putSeq(pts: Array[Array[Double]]): Unit = { putU32(out, pts.length); pts.foreach(putPoint) }
    g match {
      case GPoint(c, _, _) =>
        if (c.isEmpty) { // POINT EMPTY: NaN coordinates (OGR convention)
          val d = 2 + (if (g.hasZ) 1 else 0) + (if (g.hasM) 1 else 0)
          (0 until d).foreach(_ => putF64(out, Double.NaN))
        } else putPoint(c)
      case GLineString(pts, _, _)  => putSeq(pts)
      case GCircularString(pts, _, _) => putSeq(pts)
      case GPolygon(rings, _, _)   => putU32(out, rings.length); rings.foreach(putSeq)
      case GMultiPoint(gs, _, _)   => putU32(out, gs.length); gs.foreach(writeInto(out, _, ewkb, None))
      case GMultiLineString(gs, _, _) => putU32(out, gs.length); gs.foreach(writeInto(out, _, ewkb, None))
      case GMultiPolygon(gs, _, _) => putU32(out, gs.length); gs.foreach(writeInto(out, _, ewkb, None))
      case GCollection(gs, _, _)   => putU32(out, gs.length); gs.foreach(writeInto(out, _, ewkb, None))
      case GCompoundCurve(segs, _, _) => putU32(out, segs.length); segs.foreach(writeInto(out, _, ewkb, None))
      case GCurvePolygon(rings, _, _) => putU32(out, rings.length); rings.foreach(writeInto(out, _, ewkb, None))
      case GMultiCurve(gs, _, _)   => putU32(out, gs.length); gs.foreach(writeInto(out, _, ewkb, None))
      case GMultiSurface(gs, _, _) => putU32(out, gs.length); gs.foreach(writeInto(out, _, ewkb, None))
    }
  }

  private def putU32(out: ArrayBuffer[Byte], v: Long): Unit = {
    out += (v & 0xff).toByte
    out += ((v >> 8) & 0xff).toByte
    out += ((v >> 16) & 0xff).toByte
    out += ((v >> 24) & 0xff).toByte
  }

  private def putF64(out: ArrayBuffer[Byte], v: Double): Unit = {
    val bits = java.lang.Double.doubleToLongBits(v)
    var i = 0
    while (i < 8) { out += ((bits >> (8 * i)) & 0xff).toByte; i += 1 }
  }
}
