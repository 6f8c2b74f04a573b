package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Spark-side multimodal plumbing: typed mapPartitions decode, frame
  * sampling bounds, feature determinism. (Decode itself is a declared
  * stub — these tests pin the pipeline contract around it.) */
class MultimodalSpec extends AnyFunSuite with SparkTestSession {

  import Multimodal._

  test("decode: typed mapPartitions pipeline preserves rows and ids") {
    import spark.implicits._
    val payloads = Seq(
      MediaPayload(1L, "image/fake", Array.fill[Byte](1500)(7)),
      MediaPayload(2L, "audio/fake", Array.fill[Byte](10)(3)),
    ).toDS().repartition(3) // more partitions than rows: empty partitions OK
    val metas = decode(payloads).collect().sortBy(_.id)
    assert(metas.map(_.id).toSeq == Seq(1L, 2L))
    assert(metas(0).nBytes == 1500L && metas(0).nFrames == 2)
    assert(metas(1).nBytes == 10L && metas(1).nFrames == 1)
    assert(metas(0).width == (1500 % 640) + 1)
    assert(metas(0).fingerprint.length == 32)
    assert(metas.map(_.mediaType).toSeq == Seq("image/fake", "audio/fake"))
  }

  test("frame sampling: slices cover the payload without overlap") {
    val content = Array.tabulate[Byte](2500)(_.toByte)
    val frames = sampleFrames(content, 10)
    assert(frames.size == frameCount(content)) // capped at available frames (3)
    assert(frames.map(_.length).sum == content.length)
    assert(java.util.Arrays.equals(frames.flatMap(_.toSeq).toArray, content))
    assert(sampleFrames(Array.emptyByteArray, 4).isEmpty)
    assert(sampleFrames(null, 4).isEmpty)
  }

  test("feature vector: deterministic, bounded, content-sensitive") {
    val a = featureVector("payload one".getBytes, 16)
    val b = featureVector("payload one".getBytes, 16)
    val c = featureVector("payload two".getBytes, 16)
    assert(a.toSeq == b.toSeq)
    assert(a.toSeq != c.toSeq)
    assert(a.length == 16)
    assert(a.forall(v => v >= -1.0f && v <= 1.0f))
  }

  test("resize: typed pipeline records target dims, bounds output size") {
    import spark.implicits._
    val payloads = Seq(
      Multimodal.MediaPayload(1L, "image/fake", Array.fill[Byte](5000)(7)),
      Multimodal.MediaPayload(2L, "image/fake", Array.fill[Byte](10)(1)))
      .toDS()
    val out = Multimodal.resize(payloads, 64, 64).collect().sortBy(_.id)
    assert(out.map(_.id).toSeq == Seq(1L, 2L))
    assert(out.forall(r => r.width == 64 && r.height == 64))
    // shrink never grows the payload, and never empties it
    assert(out.forall(r => r.content.length >= 1))
    assert(out(0).content.length <= 5000)
    assert(out(1).content.length <= 10)
  }
}
