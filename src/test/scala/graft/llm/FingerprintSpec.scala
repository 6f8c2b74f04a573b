package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Rolling-hash + winnowing fingerprint properties (the MOSS scheme):
  * shift robustness, winnowing density, containment behavior. */
class FingerprintSpec extends AnyFunSuite with SparkTestSession {

  import Fingerprint._

  test("rolling hash: window hash is position-independent") {
    val bytes = "abcdefghij".getBytes
    val w = 4
    val hashes = rollingHashes(bytes, w)
    assert(hashes.length == bytes.length - w + 1)
    // hash of window starting at i equals direct hash of that slice
    (0 until hashes.length).foreach { i =>
      val direct = rollingHashes(java.util.Arrays.copyOfRange(bytes, i, i + w), w)
      assert(hashes(i) == direct(0), s"window $i")
    }
  }

  test("winnowing: at least one fingerprint per guarantee window") {
    val text = "the quick brown fox jumps over the lazy dog " * 20
    val hashes = rollingHashes(text.getBytes, DefaultWindow)
    val fps = winnow(hashes, DefaultGuarantee)
    assert(fps.nonEmpty)
    // density: winnowing keeps ~2/(g+1) of hashes; sanity-bound it
    assert(fps.length <= hashes.length)
    assert(fps.length >= hashes.length / (DefaultGuarantee * 4))
  }

  test("shifted documents share most fingerprints (the point of winnowing)") {
    val body = "spark native analytics engine with winnowed fingerprints " * 10
    val a = fingerprints(body)
    val b = fingerprints("PREFIX SHIFT >>> " + body) // same content, shifted
    assert(containmentFp(a, b) >= 900000L) // ≥90% of a's prints survive
    val unrelated = fingerprints("totally different content here entirely " * 10)
    assert(containmentFp(a, unrelated) < 100000L)
  }

  test("degenerate inputs") {
    assert(fingerprints(null).isEmpty)
    assert(fingerprints("").isEmpty)
    assert(fingerprints("tiny").length <= 1)
    assert(containmentFp(Array.empty, Array(1L)) == 0L)
    // identical docs: full containment
    val f = fingerprints("some document body with enough bytes to fingerprint")
    assert(containmentFp(f, f) == 1000000L)
  }

  test("SQL registration: explode → bucket-join candidate detection shape") {
    Fingerprint.register(spark)
    import spark.implicits._
    val body = "winnowing finds shared chunks across documents reliably " * 8
    val docs = Seq(
      (1L, body), (2L, "SHIFT " + body), (3L, "unrelated words only here " * 8),
    ).toDF("doc_id", "text")
    docs.createOrReplaceTempView("fp_docs")
    // candidate pairs via fingerprint bucket join — no all-pairs scan
    val pairs = spark.sql(
      """SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |FROM (SELECT doc_id, explode(doc_fingerprints(text)) AS fp FROM fp_docs) a
        |JOIN (SELECT doc_id, explode(doc_fingerprints(text)) AS fp FROM fp_docs) b
        |  ON a.fp = b.fp AND a.doc_id < b.doc_id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)))
    spark.catalog.dropTempView("fp_docs")
  }
}
