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

  test("cdcCuts: bounds, assembly, and boundary re-synchronization after an edit") {
    // deterministic pseudo-text long enough to carry several cuts
    val rnd = new scala.util.Random(7)
    val words = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    val body = (1 to 400).map(_ => words(rnd.nextInt(words.length))).mkString(" ")
    val cuts = Fingerprint.cdcCuts(body)
    val nb = body.getBytes("UTF-8").length
    assert(cuts.nonEmpty, "a multi-KB doc must carry cut points")
    assert(cuts.toSeq == cuts.sorted.toSeq && cuts.distinct.length == cuts.length,
      "cuts strictly ascending")
    assert(cuts.forall(c => c >= Fingerprint.DefaultWindow && c < nb),
      "every cut ends a full window and never lands on the doc end")
    // chunks reassemble to the document exactly
    def chunksOf(text: String): Seq[String] = {
      val bs = text.getBytes("UTF-8")
      val cs = Fingerprint.cdcCuts(text)
      val ends = cs :+ bs.length
      val starts = 1 +: cs.map(_ + 1)
      starts.zip(ends).map { case (s, e) => new String(bs, s - 1, e - s + 1, "UTF-8") }
    }
    assert(chunksOf(body).mkString("") === body)
    // THE CDC property: a prefix edit re-synchronizes at the next cut
    // — the shared tail keeps its chunk identities (fixed-size
    // chunking would shift and re-key every boundary downstream)
    val edited = "inserted-prefix-edit " + body
    val a = chunksOf(body).toSet
    val b = chunksOf(edited).toSet
    val shared = a.intersect(b).size
    assert(shared * 2 > a.size,
      s"expected most of ${a.size} chunks to survive the edit, shared $shared")
  }

  test("native cdc_cuts expression is bit-compatible with the Scala function") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    Fingerprint.register(spark)
    val rnd = new scala.util.Random(14)
    val texts: Seq[String] = Seq("", "x", "short text", "é ü unicode Ã mixed") ++
      (1 to 6).map(_ => (1 to rnd.nextInt(800) + 1)
        .map(_ => s"w${rnd.nextInt(9)}").mkString(" "))
    // codegen path: through a projection over a DataFrame
    val viaSql = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), expr("cdc_cuts(text)").as("cuts"))
      .collect().sortBy(_.getLong(0))
      .map(_.getSeq[Int](1).toList)
    val expected = texts.map(t => Fingerprint.cdcCuts(t).toList)
    assert(viaSql.toSeq === expected)
    // the divisor argument (q248's sweep path), and the nesting law
    val swept = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), expr("cdc_cuts(text, 32L)").as("c32"),
        expr("cdc_cuts(text, 128L)").as("c128"))
      .collect().sortBy(_.getLong(0))
    swept.zip(texts).foreach { case (r, t) =>
      assert(r.getSeq[Int](1).toList ===
        Fingerprint.cdcCuts(t, divisor = 32L).toList)
      val fine = r.getSeq[Int](1).toSet
      assert(r.getSeq[Int](2).forall(fine.contains),
        "every divisor-128 cut must also cut at divisor 32")
    }
    // interpreted path + the null contract (empty array, not null)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.StringType
    val nullEval = graft.llm.expressions.CdcCutsExpr(
      Literal.create(null, StringType)).eval(null)
    assert(nullEval.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .numElements() === 0)
    texts.foreach { t =>
      val got = graft.llm.expressions.CdcCutsExpr(Literal(t)).eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toIntArray().toList
      assert(got === Fingerprint.cdcCuts(t).toList)
    }
  }

  test("cdcChunkKeys spells chunk identities exactly like cdcChunkFrame") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    Fingerprint.register(spark)
    val rnd = new scala.util.Random(11)
    val texts = (1L to 3L).map(i => i ->
      (1 to 300).map(_ => s"w${rnd.nextInt(9)}").mkString(" "))
    val frame = Fingerprint.cdcChunkFrame(
        texts.toDF("doc_id", "text"), "doc_id", "text")
      .select(col("doc_id"), col("st"), col("len"), col("ck"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
      .sortBy(t => (t._1, t._2))
      .map(t => (t._1, t._3, t._4))
    val local = texts.flatMap { case (id, t) =>
      Fingerprint.cdcChunkKeys(t).map { case (len, key) => (id, len, key) }
    }
    assert(frame.toSeq === local,
      "the row-local twin and the frame must name every chunk identically")
  }
  test("chunkIndexErase: refcount fold == rebuild-without-the-set") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    Fingerprint.register(spark)
    val rnd = new scala.util.Random(23)
    def text(seed: Int) = (1 to 260).map(_ => s"w${(rnd.nextInt(7) + seed) % 9}").mkString(" ")
    // docs 1/2 share text (shared chunk keys — refcounts must
    // DECREMENT, not delete); doc 3 is unique (its keys must vanish)
    val shared = text(0)
    val docs = Seq((1L, shared), (2L, shared), (3L, text(3))).toDF("doc_id", "text")
    val before = Fingerprint.chunkCountIndex(docs, "doc_id", "text")
    val folded = Fingerprint.chunkIndexErase(before,
        docs.filter(col("doc_id").isin(2L, 3L)), "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val rebuilt = Fingerprint.chunkCountIndex(
        docs.filter(col("doc_id") === 1L), "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(folded === rebuilt,
      "decrement must equal the rebuild over surviving contributors")
    assert(folded.nonEmpty && folded.forall(_._2 >= 1L))
  }
}
