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

  // ---- real codec goldens: byte layouts hand-written from the BMP /
  // RIFF specs, NOT produced by the encoders — so an encoder/decoder
  // pair sharing a wrong offset cannot pass ----

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  /** 2×2 24bpp bottom-up BMP: 54-byte headers + 16 pixel bytes
    * (rows of 6 data bytes padded to 8). */
  private val goldenBmp = hex(
    "42 4D 46000000 00000000 36000000" +        // BM, size 70, res, offset 54
      "28000000 02000000 02000000 0100 1800" +  // hdr 40, w 2, h 2, planes, 24bpp
      "00000000 10000000 130B0000 130B0000 00000000 00000000" + // 72 dpi
      "AA" * 16)

  /** 8 kHz mono 16-bit PCM WAV with two frames (44 + 4 bytes). */
  private val goldenWav = hex(
    "52494646 28000000 57415645" +              // RIFF, size 40, WAVE
      "666D7420 10000000 0100 0100 401F0000 803E0000 0200 1000" +
      "64617461 04000000 11223344")             // data, size 4, samples

  test("wavActivity: windows, scaled tail threshold, segment runs, rejects junk") {
    // 40 mono frames, win 16 → windows of 16/16/8 samples; sawtooth
    // sample i = (i*257) % 65536 - 32768
    val wav = Multimodal.encodeWav(8000, 1, 40)
    def absSum(lo: Int, hi: Int) =
      (lo until hi).map(i => math.abs((i * 257) % 65536 - 32768).toLong).sum
    val Some((nw, na, ns)) = Multimodal.wavActivity(wav, 16, 16384L)
    assert(nw === 3L)
    val acts = Seq((0, 16), (16, 32), (32, 40)).map { case (lo, hi) =>
      absSum(lo, hi) > 16384L * (hi - lo)
    }
    assert(na === acts.count(identity).toLong)
    val expSeg = acts.zip(false +: acts).count { case (a, p) => a && !p }
    assert(ns === expSeg.toLong)
    // threshold 0 → every window active, one segment spanning all
    assert(Multimodal.wavActivity(wav, 16, 0L) === Some((3L, 3L, 1L)))
    // impossible threshold → nothing active, zero segments
    assert(Multimodal.wavActivity(wav, 16, 40000L) === Some((3L, 0L, 0L)))
    assert(Multimodal.wavActivity(Array[Byte](1, 2, 3), 16, 0L) === None)
  }

  test("decodeBmp reads dims from real header bytes; rejects malformed") {
    assert(decodeBmp(goldenBmp) == Some((2, 2)))
    // top-down variant: height −2 at offset 22 still reports (2, 2)
    val topDown = goldenBmp.clone()
    topDown(22) = 0xFE.toByte; topDown(23) = 0xFF.toByte
    topDown(24) = 0xFF.toByte; topDown(25) = 0xFF.toByte
    assert(decodeBmp(topDown) == Some((2, 2)))
    assert(decodeBmp(goldenBmp.take(40)).isEmpty)          // truncated
    assert(decodeBmp("BMnot a bitmap at all".getBytes).isEmpty)
    val wrongSize = goldenBmp.clone(); wrongSize(2) = 0x45 // declared ≠ actual
    assert(decodeBmp(wrongSize).isEmpty)
    val badMagic = goldenBmp.clone(); badMagic(0) = 'X'.toByte
    assert(decodeBmp(badMagic).isEmpty)
  }

  test("decodeWav walks RIFF chunks; rejects malformed") {
    assert(decodeWav(goldenWav) == Some(WavInfo(8000, 1, 16, 2)))
    // an extra LIST chunk between fmt and data must not break parsing
    val withList = hex(
      "52494646 34000000 57415645" +
        "666D7420 10000000 0100 0200 401F0000 007D0000 0400 1000" + // stereo
        "4C495354 04000000 494E464F" +                             // LIST INFO
        "64617461 04000000 11223344")                              // 1 stereo frame
    assert(decodeWav(withList) == Some(WavInfo(8000, 2, 16, 1)))
    assert(decodeWav(goldenWav.take(20)).isEmpty)
    val badRiff = goldenWav.clone(); badRiff(0) = 'X'.toByte
    assert(decodeWav(badRiff).isEmpty)
    val wrongSize = goldenWav.clone(); wrongSize(4) = 0x10
    assert(decodeWav(wrongSize).isEmpty)
    // hostile declared chunk size near Int.MaxValue: Int math would
    // wrap the bounds check and index negatively — must return None
    // total 108 bytes, declared RIFF size 100 == length-8 (valid), so
    // the walk actually reaches the hostile chunk
    val overflow = hex(
      "52494646 64000000 57415645" + "4A554E4B F0FFFF7F" + "00" * 88)
    assert(decodeWav(overflow).isEmpty)
  }

  test("encoders round-trip through the parsers at spec-exact sizes") {
    for ((w, h) <- Seq((1, 1), (2, 2), (3, 7), (64, 48), (640, 1))) {
      val bytes = encodeBmp(w, h)
      assert(decodeBmp(bytes) == Some((w, h)), s"bmp $w x $h")
      assert(bytes.length == 54 + bmpRowSize(w) * h)
    }
    for ((rate, ch, frames) <- Seq((8000, 1, 0), (8000, 1, 2), (44100, 2, 777))) {
      val bytes = encodeWav(rate, ch, frames)
      assert(decodeWav(bytes) == Some(WavInfo(rate, ch, 16, frames)))
      assert(bytes.length == 44 + frames * ch * 2)
    }
    // the golden byte strings match the encoders byte-for-byte except
    // payload bytes (headers identical = offsets agree with the spec)
    assert(encodeBmp(2, 2).take(54).toSeq == goldenBmp.take(54).toSeq)
    assert(encodeWav(8000, 1, 2).take(44).toSeq == goldenWav.take(44).toSeq)
  }

  test("decode dispatches real parsers by media type; malformed rows survive") {
    import spark.implicits._
    val payloads = Seq(
      MediaPayload(1L, "image/bmp", encodeBmp(5, 3)),
      MediaPayload(2L, "audio/wav", encodeWav(16000, 2, 10)),
      MediaPayload(3L, "image/bmp", Array.fill[Byte](60)(1)), // corrupt
      MediaPayload(4L, "image/fake", Array.fill[Byte](100)(2)), // stub path
    ).toDS()
    val metas = decode(payloads).collect().sortBy(_.id)
    assert(metas(0).width == 5 && metas(0).height == 3 && metas(0).nFrames == 1)
    assert(metas(1).width == 16000 && metas(1).height == 2 && metas(1).nFrames == 10)
    assert(metas(2).width == 0 && metas(2).height == 0 && metas(2).nFrames == 0)
    assert(metas(3).width == (100 % 640) + 1) // stub fallback intact
    assert(metas.forall(_.fingerprint.length == 32))
  }

  test("dHashBits: 64 gradient bits, light-noise invariant, corruption-sensitive, rejects junk") {
    val img = Multimodal.encodeBmp(40, 30)
    val h0 = Multimodal.dHashBits(img).get
    assert(h0.length === 64 && h0.forall(c => c == '0' || c == '1'))
    // deterministic
    assert(Multimodal.dHashBits(Multimodal.encodeBmp(40, 30)).get === h0)
    // +1 on every 37th data byte changes bytes but not the hash
    val light = Multimodal.perturbBmp(img, 37).get
    assert(!java.util.Arrays.equals(light, img),
      "perturbation must actually edit the payload")
    assert(java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(light, 0, 54),
      java.util.Arrays.copyOfRange(img, 0, 54)), "header untouched")
    assert(Multimodal.dHashBits(light).get === h0,
      "a perceptual hash must shrug off a one-ulp pixel edit")
    // +128 on every 4th byte is corruption — the hash must move
    val heavy = Multimodal.perturbBmp(img, 4, 128).get
    assert(Multimodal.dHashBits(heavy).get !== h0,
      "a perceptual hash that survives gross corruption keys nothing")
    // different content hashes differently; junk is rejected
    assert(Multimodal.dHashBits(Multimodal.encodeBmp(41, 30)).get !== h0)
    assert(Multimodal.dHashBits("not a bmp".getBytes).isEmpty)
    assert(Multimodal.perturbBmp("nope".getBytes, 4).isEmpty)
  }

  test("resizeBmp: identity resample reproduces the source pixels") {
    // nearest-neighbor at the same dims maps every target pixel to
    // itself. Padding bytes are unspecified (the fixture encoder fills
    // them, the resampler zeroes them), so: byte-exact when the stride
    // needs no padding, decoded-pixel-exact otherwise.
    for ((w, h) <- Seq((4, 3), (8, 2))) { // w*3 % 4 == 0: no padding
      val src = encodeBmp(w, h)
      assert(resizeBmp(src, w, h).get.toSeq == src.toSeq, s"identity $w x $h")
    }
    for ((w, h) <- Seq((1, 1), (3, 7), (16, 5))) {
      val src = encodeBmp(w, h)
      val out = resizeBmp(src, w, h).get
      assert(decodeBmp(out) == Some((w, h)))
      val n = w * h * 3
      assert(bmpBandSums(out, n).get.toSeq == bmpBandSums(src, n).get.toSeq,
        s"identity $w x $h pixel stream")
    }
  }

  test("resizeBmp: hand-computed 2x1 -> 1x1 golden case, round-trips decode") {
    // source 2x1: stride 8, pixels at data[0..2] (B,G,R of pixel 0) =
    // 0,1,2; target 1x1 samples source pixel (0,0) -> bytes 0,1,2
    val out = resizeBmp(encodeBmp(2, 1), 1, 1).get
    assert(decodeBmp(out) == Some((1, 1)))
    assert(out.length == 54 + bmpRowSize(1) * 1)
    assert(out.slice(54, 57).toSeq == Seq[Byte](0, 1, 2))
    // 1x2 -> 1x1 picks IMAGE-space row 0, which bottom-up stores LAST:
    // source data row 1 (file) = image row 0 = bytes 4,5,6 (stride 4)
    val tall = resizeBmp(encodeBmp(1, 2), 1, 1).get
    assert(tall.slice(54, 57).toSeq == Seq[Byte](4, 5, 6))
    // upscale duplicates pixels: 1x1 -> 2x2, all four pixels = source
    val up = resizeBmp(encodeBmp(1, 1), 2, 2).get
    assert(decodeBmp(up) == Some((2, 2)))
    val rows = Seq(54, 54 + bmpRowSize(2))
    for (r <- rows) assert(up.slice(r, r + 6).toSeq == Seq[Byte](0, 1, 2, 0, 1, 2))
    // malformed input -> None, not a throw
    assert(resizeBmp(Array.fill[Byte](60)(1), 2, 2).isEmpty)
    // overflowing TARGET dims are a caller bug -> loud require, not a
    // wrapped allocation
    intercept[IllegalArgumentException] {
      resizeBmp(encodeBmp(2, 2), 1000000, 4300)
    }
  }

  test("hostile BMP width: int-wrapped stride must not pass the bounds check") {
    // 58-byte payload whose width makes w*3 wrap in Int space: with
    // Int stride math bmpRowSize(1431655766) = 4, the pixel-array
    // bounds check passes, and the pixel operators index ~2e9 offsets
    // into a 58-byte array. Long stride math must reject it instead.
    val buf = java.nio.ByteBuffer.allocate(58).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(58)          // declared file size == payload length
    buf.putInt(0)
    buf.putInt(54)          // pixel offset
    buf.putInt(40)          // BITMAPINFOHEADER
    buf.putInt(1431655766)  // width: w*3 wraps to 2 in Int space
    buf.putInt(1)           // height
    buf.putShort(1)
    buf.putShort(24)
    buf.putInt(0)           // BI_RGB
    val hostile = buf.array()
    assert(decodeBmp(hostile) == Some((1431655766, 1))) // header itself parses
    assert(resizeBmp(hostile, 2, 2).isEmpty)            // but pixel ops reject
    assert(bmpBandSums(hostile, 2).isEmpty)
  }

  test("bmpBandSums: bands partition the decoded pixel stream; padding excluded") {
    val src = encodeBmp(3, 2) // stride 12, 3 padding bytes per row
    val one = bmpBandSums(src, 1).get
    // brute force in image order: rows bottom-up, row bytes 0..8 of each
    val expected = (0 until 2).flatMap { y =>
      (0 until 9).map(rem => ((2 - 1 - y) * 12 + rem) % 251)
    }.map(_.toLong).sum
    assert(one.toSeq == Seq(expected))
    // band sums refine the total; empty bands (n < bands) report 0
    val four = bmpBandSums(src, 4).get
    assert(four.sum == expected)
    val tiny = bmpBandSums(encodeBmp(1, 1), 5).get // n = 3 < 5 bands
    assert(tiny.length == 5 && tiny.sum == (0 + 1 + 2))
    assert(bmpBandSums(Array.fill[Byte](10)(0), 2).isEmpty)
  }

  test("wavBandEnergies: |PCM| sums over decoded samples") {
    val wav = encodeWav(8000, 2, 6) // 12 interleaved samples
    val expected = (0 until 12).map(i => math.abs((i * 257) % 65536 - 32768).toLong)
    assert(wavBandEnergies(wav, 1).get.toSeq == Seq(expected.sum))
    val four = wavBandEnergies(wav, 4).get
    assert(four.toSeq == expected.grouped(3).map(_.sum).toSeq)
    // zero-frame file: all bands 0, not a crash
    assert(wavBandEnergies(encodeWav(8000, 1, 0), 3).get.toSeq == Seq(0L, 0L, 0L))
    assert(wavBandEnergies(Array.fill[Byte](50)(1), 2).isEmpty)
    // bandEnergies dispatches by media type
    assert(bandEnergies(MediaPayload(1L, "audio/wav", wav), 1).get.head == expected.sum)
    assert(bandEnergies(MediaPayload(2L, "image/bmp", encodeBmp(2, 2)), 1).isDefined)
    assert(bandEnergies(MediaPayload(3L, "video/mp4", wav), 1).isEmpty)
  }

  test("resize dispatches the real BMP resampler; corrupt BMPs degrade to empty") {
    import spark.implicits._
    val payloads = Seq(
      Multimodal.MediaPayload(1L, "image/bmp", encodeBmp(10, 4)),
      Multimodal.MediaPayload(2L, "image/bmp", Array.fill[Byte](70)(3))).toDS()
    val out = Multimodal.resize(payloads, 4, 4).collect().sortBy(_.id)
    assert(decodeBmp(out(0).content) == Some((4, 4))) // genuinely re-encoded
    assert(out(1).width == 0 && out(1).content.isEmpty) // survived, flagged
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

  test("videoFrameSpans: walks frame-to-frame via declared BMP sizes") {
    val dims = Seq((3, 2), (5, 1), (1, 4))
    val vid = encodeVideo(dims)
    val spans = videoFrameSpans(vid).get
    assert(spans.size == 3)
    assert(spans.head._1 == 8) // first frame right after magic+count
    // each span is a decodable BMP with the declared dims
    dims.zip(spans).foreach { case ((w, h), (off, len)) =>
      val frame = java.util.Arrays.copyOfRange(vid, off, off + len)
      assert(decodeBmp(frame) == Some((w, h)))
    }
    // spans tile the payload exactly
    assert(spans.map(_._2).sum + 8 == vid.length)
  }

  test("videoFrameSpans: malformed containers return None, never throw") {
    val vid = encodeVideo(Seq((2, 2)))
    assert(videoFrameSpans(null).isEmpty)
    assert(videoFrameSpans(Array.emptyByteArray).isEmpty)
    assert(videoFrameSpans(vid.take(7)).isEmpty) // truncated header
    assert(videoFrameSpans("NOPE".getBytes ++ vid.drop(4)).isEmpty) // bad magic
    assert(videoFrameSpans(vid ++ Array[Byte](0)).isEmpty) // trailing garbage
    val truncated = vid.dropRight(1)
    assert(videoFrameSpans(truncated).isEmpty) // last frame overruns
  }

  test("videoFrameSpans: hostile frame count must not allocate before validating") {
    // header declares nf near Int.MaxValue over an 8-byte payload: the
    // count is rejected against the 54-bytes-per-frame floor BEFORE the
    // span buffer is sized from it (a multi-GB allocation otherwise)
    val hostile = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    hostile.put(VideoMagic).putInt(Int.MaxValue - 1)
    assert(videoFrameSpans(hostile.array()).isEmpty)
    // and a count that is plausible but one frame more than present
    val vid = encodeVideo(Seq((2, 2), (3, 3)))
    val overCount = vid.clone()
    java.nio.ByteBuffer.wrap(overCount).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, 3)
    assert(videoFrameSpans(overCount).isEmpty)
  }

  test("sampleVideoFrames: evenly spaced, Long index arithmetic at high frame counts") {
    val vid = encodeVideo(Seq((2, 1), (2, 2), (2, 3), (2, 4), (2, 5)))
    val picked = sampleVideoFrames(vid, 3)
    assert(picked.map(_._1) == Seq(0, 1, 3)) // trunc(j*5/3)
    assert(picked.forall(_._2 == 5))
    assert(picked.map(f => decodeBmp(f._3).get._2) == Seq(1, 2, 4))
    assert(sampleVideoFrames(vid, 0).isEmpty)
    assert(sampleVideoFrames(Array[Byte](1, 2), 3).isEmpty)
    // 50k minimal frames: j*nf overflows Int (~2.5e9) if the sample
    // index is computed in Int space — the Long path must stay in bounds
    val many = encodeVideo(Seq.fill(50000)((1, 1)))
    val all = sampleVideoFrames(many, 50000)
    assert(all.size == 50000 && all.last._1 == 49999)
  }

  test("videoFrameDupStats: cross-container duplicate frames counted, unique ones not") {
    import spark.implicits._
    // containers 1 and 2 share the (4,3) frame; container 2 repeats it
    // internally (still one distinct container pairing); container 3 is
    // malformed and must survive as a zero-frame row
    val payloads = Seq(
      MediaPayload(1L, "video/gvid", encodeVideo(Seq((4, 3), (5, 2)))),
      MediaPayload(2L, "video/gvid", encodeVideo(Seq((4, 3), (6, 7), (4, 3)))),
      MediaPayload(3L, "video/gvid", Array[Byte](1, 2, 3)),
    ).toDS()
    val out = videoFrameDupStats(payloads).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((2L, 1L, 2L))) // (4,3) duplicated cross-container, (5,2) unique
    assert(out(2L) == ((3L, 2L, 2L))) // both (4,3) occurrences dup; (6,7) unique
    assert(out(3L) == ((0L, 0L, 0L))) // malformed container degrades, row survives
    // within-ONE-container repeats alone are not cross-container dups
    val solo = Seq(MediaPayload(9L, "video/gvid",
      encodeVideo(Seq((2, 2), (2, 2))))).toDS()
    val soloOut = videoFrameDupStats(solo).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).head
    assert(soloOut == ((2L, 0L, 1L)))
  }

  test("videoSceneCuts: threshold splits cuts from continuations; malformed degrades") {
    import spark.implicits._
    // mean pixel replayed from the BMP generation rule (pixel byte =
    // dataIdx % 251), the same arithmetic the q123 oracle uses
    def mp(w: Int, h: Int): Long = {
      val stride = ((w * 3 + 3) / 4) * 4
      var s = 0L
      for (r <- 0 until h; j <- 0 until w * 3) s += (r * stride + j) % 251
      s * 1000L / (w.toLong * h * 3L)
    }
    val dims = Seq((4, 3), (4, 3), (24, 20))
    val deltas = dims.sliding(2).map { case Seq((w1, h1), (w2, h2)) =>
      math.abs(mp(w2, h2) - mp(w1, h1))
    }.toSeq
    // the fixture must exercise both branches of the rule
    assert(deltas.head == 0L && deltas.last > 0L)
    val thr = deltas.last // cut fires on >=, so exactly the big jump
    val payloads = Seq(
      MediaPayload(1L, "video/gvid", encodeVideo(dims)),
      MediaPayload(2L, "video/gvid", Array[Byte](9, 9, 9)), // malformed
    ).toDS()
    val out = videoSceneCuts(payloads, thr).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === ((3L, 1L, 2L)), s"got ${out(1L)}")
    assert(out(2L) === ((0L, 0L, 0L)), "malformed container degrades to zeros")
    // a higher threshold erases the cut: one scene
    val calm = videoSceneCuts(payloads, thr + 1).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(calm(1L) === 1L)
  }

  test("mediaDupStats: decoded-content dups counted per type; raw fallback for undecodable") {
    import spark.implicits._
    val payloads = Seq(
      MediaPayload(1L, "audio/wav", encodeWav(8000, 1, 10)),
      MediaPayload(2L, "audio/wav", encodeWav(8000, 1, 10)), // decoded dup of 1
      MediaPayload(3L, "audio/wav", encodeWav(8000, 2, 10)), // channels differ → unique
      MediaPayload(4L, "image/bmp", encodeBmp(3, 2)),
      MediaPayload(5L, "image/bmp", encodeBmp(3, 2)),        // decoded dup of 4
      MediaPayload(6L, "image/bmp", Array[Byte](9, 9, 9)),   // malformed → raw-bytes hash
      MediaPayload(7L, "image/bmp", Array[Byte](9, 9, 9)),   // exact raw dup of 6
      MediaPayload(8L, "application/x", "abc".getBytes("UTF-8")), // no codec → raw, unique
    ).toDS()
    val out = mediaDupStats(payloads).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 2L, 5L -> 2L,
      6L -> 2L, 7L -> 2L, 8L -> 1L))
  }
}
