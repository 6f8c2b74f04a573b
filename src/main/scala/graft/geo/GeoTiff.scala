package graft.geo

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal single-band GeoTIFF codec — just enough surface for DTM
  * rasters (the reference feeds GDAL whole GeoTIFF bytes,
  * `udf_tools.py:146-162`; offline there is no GDAL, so the engine
  * reads the container directly).
  *
  * Supported: both byte orders, uncompressed strips, one sample per
  * pixel, float32 / int16 / uint16 samples, geotransform from
  * ModelPixelScale (33550) + ModelTiepoint (33922) with north-up
  * orientation. Anything else → None (→ the UDF's null contract).
  */
object GeoTiff {

  /** North-up geotransform: pixel (row, col) center →
    * (originX + (col+0.5)·pixelW, originY − (row+0.5)·pixelH). */
  final case class GeoTransform(originX: Double, originY: Double,
      pixelW: Double, pixelH: Double) {
    def x(col: Double): Double = originX + col * pixelW
    def y(row: Double): Double = originY - row * pixelH
  }

  object GeoTransform {
    val Identity: GeoTransform = GeoTransform(0.0, 0.0, 1.0, 1.0)
  }

  final case class Raster(width: Int, height: Int, values: Array[Float],
      transform: GeoTransform) {
    def apply(row: Int, col: Int): Float = values(row * width + col)
  }

  private final case class IfdEntry(tag: Int, fieldType: Int, count: Long, valueOffset: Long)

  def read(bytes: Array[Byte]): Option[Raster] =
    try readInternal(bytes) catch { case scala.util.control.NonFatal(_) => None }

  private def readInternal(bytes: Array[Byte]): Option[Raster] = {
    if (bytes == null || bytes.length < 8) return None
    val order = (bytes(0), bytes(1)) match {
      case ('I', 'I') => ByteOrder.LITTLE_ENDIAN
      case ('M', 'M') => ByteOrder.BIG_ENDIAN
      case _          => return None
    }
    val bb = ByteBuffer.wrap(bytes).order(order)
    if (bb.getShort(2) != 42) return None
    val ifdOffset = bb.getInt(4).toLong & 0xffffffffL
    if (ifdOffset + 2 > bytes.length) return None
    val n = bb.getShort(ifdOffset.toInt) & 0xffff
    val entries = (0 until n).map { i =>
      val off = ifdOffset.toInt + 2 + i * 12
      IfdEntry(bb.getShort(off) & 0xffff, bb.getShort(off + 2) & 0xffff,
        bb.getInt(off + 4).toLong & 0xffffffffL, off + 8L)
    }.map(e => e.tag -> e).toMap

    def intValues(e: IfdEntry): Seq[Long] = {
      val size = e.fieldType match {
        case 3 => 2 // SHORT
        case 4 => 4 // LONG
        case _ => return Seq.empty
      }
      val total = size * e.count
      val base = if (total <= 4) e.valueOffset.toInt else bb.getInt(e.valueOffset.toInt)
      (0 until e.count.toInt).map { i =>
        if (size == 2) (bb.getShort(base + 2 * i) & 0xffffL)
        else bb.getInt(base + 4 * i).toLong & 0xffffffffL
      }
    }
    def doubleValues(e: IfdEntry): Seq[Double] = {
      if (e.fieldType != 12) return Seq.empty
      val base = bb.getInt(e.valueOffset.toInt)
      (0 until e.count.toInt).map(i => bb.getDouble(base + 8 * i))
    }
    def intValue(tag: Int, default: Long = -1): Long =
      entries.get(tag).flatMap(intValues(_).headOption).getOrElse(default)

    val width = intValue(256).toInt
    val height = intValue(257).toInt
    if (width <= 0 || height <= 0 || width.toLong * height > 64L * 1024 * 1024) return None
    if (intValue(259, 1) != 1) return None // only uncompressed
    if (intValue(277, 1) != 1) return None // single band
    val bits = intValue(258, 32).toInt
    val sampleFormat = intValue(339, if (bits == 32) 3 else 1).toInt

    val stripOffsets = entries.get(273).map(intValues).getOrElse(Seq.empty)
    val stripCounts = entries.get(279).map(intValues).getOrElse(Seq.empty)
    if (stripOffsets.isEmpty || stripOffsets.size != stripCounts.size) return None

    val bytesPerSample = bits / 8
    val data = new Array[Byte](width * height * bytesPerSample)
    var pos = 0
    stripOffsets.zip(stripCounts).foreach { case (off, cnt) =>
      if (off + cnt > bytes.length || pos + cnt > data.length) return None
      System.arraycopy(bytes, off.toInt, data, pos, cnt.toInt)
      pos += cnt.toInt
    }
    if (pos != data.length) return None

    val db = ByteBuffer.wrap(data).order(order)
    val values = new Array[Float](width * height)
    var i = 0
    (bits, sampleFormat) match {
      case (32, 3) => while (i < values.length) { values(i) = db.getFloat(4 * i); i += 1 }
      case (16, 2) => while (i < values.length) { values(i) = db.getShort(2 * i).toFloat; i += 1 }
      case (16, 1) => while (i < values.length) { values(i) = (db.getShort(2 * i) & 0xffff).toFloat; i += 1 }
      case _       => return None
    }

    val transform = (for {
      scaleE <- entries.get(33550)
      tieE <- entries.get(33922)
      scale = doubleValues(scaleE)
      tie = doubleValues(tieE)
      if scale.size >= 2 && tie.size >= 6
    } yield GeoTransform(
      originX = tie(3) - tie(0) * scale(0),
      originY = tie(4) + tie(1) * scale(1),
      pixelW = scale(0), pixelH = scale(1)))
      .getOrElse(GeoTransform.Identity)

    Some(Raster(width, height, values, transform))
  }

  /** Write a float32 single-strip little-endian GeoTIFF — fixture
    * generator for tests and the raster-sink path. */
  def writeFloat32(width: Int, height: Int, values: Array[Float],
      transform: GeoTransform = GeoTransform.Identity): Array[Byte] = {
    require(values.length == width * height)
    val nEntries = 11
    val headerSize = 8
    val ifdSize = 2 + nEntries * 12 + 4
    val scaleOffset = headerSize + ifdSize
    val tieOffset = scaleOffset + 3 * 8
    val dataOffset = tieOffset + 6 * 8
    val out = ByteBuffer.allocate(dataOffset + values.length * 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.put('I'.toByte).put('I'.toByte).putShort(42).putInt(headerSize)
    out.putShort(nEntries.toShort)
    def entry(tag: Int, tpe: Int, count: Int, value: Long): Unit =
      out.putShort(tag.toShort).putShort(tpe.toShort).putInt(count).putInt(value.toInt)
    entry(256, 4, 1, width)             // ImageWidth
    entry(257, 4, 1, height)            // ImageLength
    entry(258, 3, 1, 32)                // BitsPerSample
    entry(259, 3, 1, 1)                 // Compression: none
    entry(262, 3, 1, 1)                 // Photometric: BlackIsZero
    entry(273, 4, 1, dataOffset)        // StripOffsets
    entry(277, 3, 1, 1)                 // SamplesPerPixel
    entry(278, 4, 1, height)            // RowsPerStrip
    entry(279, 4, 1, values.length * 4) // StripByteCounts
    entry(33550, 12, 3, scaleOffset)    // ModelPixelScale
    entry(33922, 12, 6, tieOffset)      // ModelTiepoint
    out.putInt(0) // next IFD
    out.putDouble(transform.pixelW).putDouble(transform.pixelH).putDouble(0.0)
    out.putDouble(0.0).putDouble(0.0).putDouble(0.0) // raster point (0,0)
      .putDouble(transform.originX).putDouble(transform.originY).putDouble(0.0)
    values.foreach(out.putFloat)
    out.array()
  }
}
