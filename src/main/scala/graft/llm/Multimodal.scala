package graft.llm

import java.security.MessageDigest

import org.apache.spark.sql.{Dataset, SparkSession}

/** Multimodal (image/audio/video) column handling for a training-data
  * pipeline: payloads travel as opaque `binary` columns with typed
  * metadata, the reference's geometry-as-binary convention (SURVEY.md
  * §1.3) generalized.
  *
  * The heavy per-row work runs in `Dataset.mapPartitions` with
  * per-partition initialization — the JVM-native equivalent of a
  * pandas-UDF/`mapInPandas` batch (the reference's vectorization
  * boundary, `udf_tools.py:216-244`): decoder state is allocated once
  * per partition, rows stream through it, and nothing touches the
  * driver. At scale the pipeline is embarrassingly parallel — no
  * shuffle until a caller aggregates.
  *
  * ⚠️ STUB BOUNDARY: no image/audio codecs exist in this environment,
  * so [[decodeDims]] and [[featureVector]] are deterministic fakes
  * standing in for a real decoder/encoder (e.g. javax.imageio /
  * an ONNX runtime). The Spark-side contract — schemas, encoders,
  * partition amortization, null behavior — is real and tested; swap
  * the two stub functions for real codecs to productionize.
  */
object Multimodal {

  /** Opaque payload row: the storage convention. */
  final case class MediaPayload(id: Long, mediaType: String, content: Array[Byte])

  /** Typed metadata extracted from a payload. */
  final case class MediaMeta(
      id: Long,
      mediaType: String,
      width: Int,
      height: Int,
      nFrames: Int,
      nBytes: Long,
      fingerprint: String)

  /** STUB decode — derives plausible dimensions deterministically from
    * the payload size (a real implementation parses the container
    * header). Mirrorable in any engine, which lets the oracle check
    * the full pipeline. */
  def decodeDims(content: Array[Byte]): (Int, Int) =
    ((content.length % 640) + 1, ((content.length * 7) % 480) + 1)

  /** STUB frame count: one frame per 1000 payload bytes. */
  def frameCount(content: Array[Byte]): Int = content.length / 1000 + 1

  /** Decode a payload dataset to typed metadata. Per-partition digest
    * allocation is the batch-amortization point. */
  def decode(payloads: Dataset[MediaPayload]): Dataset[MediaMeta] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5") // per-partition init
      it.map { p =>
        val (w, h) = decodeDims(p.content)
        md.reset()
        val fp = md.digest(p.content).map(b => f"${b & 0xff}%02x").mkString
        MediaMeta(p.id, p.mediaType, w, h, frameCount(p.content),
          p.content.length.toLong, fp)
      }
    }
  }

  /** Frame sampling: n evenly-spaced byte slices standing in for
    * decoded video frames — the real plumbing shape
    * (`array<binary>` out, bounded memory per row). */
  def sampleFrames(content: Array[Byte], n: Int): Seq[Array[Byte]] = {
    if (content == null || content.isEmpty || n <= 0) return Seq.empty
    val frames = math.min(n, frameCount(content))
    val span = content.length.toDouble / frames
    (0 until frames).map { i =>
      val from = (i * span).toInt
      val until = math.min(content.length, ((i + 1) * span).toInt.max(from + 1))
      java.util.Arrays.copyOfRange(content, from, until)
    }
  }

  /** Resized payload with its new declared dimensions. */
  final case class ResizedMedia(id: Long, mediaType: String,
      width: Int, height: Int, content: Array[Byte])

  /** STUB resize — scales the payload byte budget by the area ratio
    * (a real implementation decodes, interpolates, re-encodes). The
    * Spark-side shape is the real one: mapPartitions over typed rows,
    * bounded output size per row, target dims recorded in metadata. */
  def resize(payloads: Dataset[MediaPayload], targetW: Int, targetH: Int): Dataset[ResizedMedia] = {
    require(targetW > 0 && targetH > 0, "target dimensions must be positive")
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.mapPartitions { it =>
      it.map { p =>
        val (w, h) = decodeDims(p.content)
        val scale = (targetW.toLong * targetH).toDouble / (w.toLong * h).toDouble
        val newLen = math.max(1, math.min(p.content.length,
          math.round(p.content.length * scale).toInt))
        ResizedMedia(p.id, p.mediaType, targetW, targetH,
          java.util.Arrays.copyOf(p.content, newLen))
      }
    }
  }

  /** STUB feature extraction: FNV-1a-seeded pseudo-embedding in
    * [-1, 1] — a real implementation runs an encoder model over the
    * decoded media. Deterministic per payload. */
  def featureVector(content: Array[Byte], dim: Int = 16): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < content.length) {
      h ^= (content(i) & 0xffL); h *= 0x100000001b3L
      i += 1
    }
    var j = 0
    while (j < dim) {
      h ^= j.toLong; h *= 0x100000001b3L
      out(j) = ((h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0).toFloat
      j += 1
    }
    out
  }

  /** Wrap a text corpus as fake media payloads (fixture path used by
    * q27: the documents table stands in for a media table). */
  def documentsAsMedia(spark: SparkSession, dir: String): Dataset[MediaPayload] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .selectExpr("doc_id AS id", "'image/fake' AS mediaType",
        "cast(text AS binary) AS content")
      .as[MediaPayload]
  }
}
