package graft.llm

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck over the pure-JVM container walk: encode → walk → decode
  * must round-trip for arbitrary frame lists, the sampling arithmetic
  * must stay ordered and in range, and ANY truncation must fail the
  * walk cleanly (None, never a throw or a partial result) — the
  * malformed-input contract a 100 TB scan depends on. */
object MultimodalProps extends Properties("Multimodal") {

  import Multimodal._

  private val genDims: Gen[List[(Int, Int)]] =
    Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n,
      for { w <- Gen.chooseNum(1, 32); h <- Gen.chooseNum(1, 24) } yield (w, h)))

  property("videoFrameSpans round-trips encodeVideo; spans tile exactly") =
    forAll(genDims) { dims =>
      val vid = encodeVideo(dims)
      videoFrameSpans(vid).exists { spans =>
        spans.size == dims.size &&
          spans.map(_._2).sum + 8 == vid.length &&
          dims.zip(spans).forall { case ((w, h), (off, len)) =>
            decodeBmp(java.util.Arrays.copyOfRange(vid, off, off + len))
              .contains((w, h))
          }
      }
    }

  property("sampleVideoFrames: sorted distinct in-range indices, size min(take, nf)") =
    forAll(genDims, Gen.chooseNum(1, 10)) { (dims, take) =>
      val picked = sampleVideoFrames(encodeVideo(dims), take)
      val idx = picked.map(_._1)
      picked.size == math.min(take, dims.size) &&
        idx == idx.sorted && idx.distinct == idx &&
        idx.forall(f => f >= 0 && f < dims.size) &&
        picked.forall(_._2 == dims.size)
    }

  property("any strict truncation fails the walk with None, never a throw") =
    forAll(genDims, Gen.chooseNum(1, 60)) { (dims, cut) =>
      val vid = encodeVideo(dims)
      val keep = math.max(0, vid.length - 1 - (cut % vid.length))
      videoFrameSpans(java.util.Arrays.copyOf(vid, keep)).isEmpty
    }
}
