package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Product quantization: codebook shape, encode determinism, ADC
  * ranking behavior, and rerank agreement with the exact path. */
class PqSpec extends AnyFunSuite with SparkTestSession {

  /** 4 well-separated clusters of 25 vectors over dim 16 — each
    * cluster lives in its own 4-dim block, so 2 subspaces of 8 dims
    * each see 2 distinguishable patterns. */
  private lazy val clustered = {
    import spark.implicits._
    val centers = Seq(
      Array.tabulate(16)(i => if (i < 4) 1.0f else 0.0f),
      Array.tabulate(16)(i => if (i >= 4 && i < 8) 1.0f else 0.0f),
      Array.tabulate(16)(i => if (i >= 8 && i < 12) 1.0f else 0.0f),
      Array.tabulate(16)(i => if (i >= 12) 1.0f else 0.0f))
    (0 until 100).map { id =>
      val c = centers(id % 4)
      val v = c.zipWithIndex.map { case (x, j) =>
        x + 0.01f * (((id * 31 + j * 7) % 11) - 5)
      }
      (id.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  test("fitSubspaces: m codebooks of kSub × subDim, dim must divide") {
    val cbs = PqIndex.fitSubspaces(clustered, m = 2, kSub = 4, nIter = 2)
    assert(cbs.length === 2)
    assert(cbs.forall(_.length === 4))
    assert(cbs.forall(_.forall(_.length === 8)))
    val e = intercept[IllegalArgumentException] {
      PqIndex.fitSubspaces(clustered, m = 3, kSub = 4, nIter = 1)
    }
    assert(e.getMessage.contains("divide"))
  }

  test("encode: codes in range, deterministic, partition-invariant") {
    val cbs = PqIndex.fitSubspaces(clustered, m = 2, kSub = 4, nIter = 2)
    val a = PqIndex.encode(clustered.repartition(1), cbs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val b = PqIndex.encode(clustered.repartition(13), cbs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(a === b)
    assert(a.values.forall(cs => cs.length == 2 && cs.forall(c => c >= 0 && c < 4)))
  }

  test("same-cluster vectors share codes; ADC search finds the cluster") {
    val cbs = PqIndex.fitSubspaces(clustered, m = 2, kSub = 4, nIter = 3)
    // clusters 2 and 3 are both all-zero in subspace 0 (noise splits
    // them over codes there), so "one code word per cluster" is NOT
    // the invariant — but no two DIFFERENT clusters may ever share a
    // full code word: each pair differs by a full unit block in at
    // least one subspace
    val codeSets = PqIndex.encode(clustered, cbs)
      .withColumn("cluster", col("vec_id") % 4)
      .collect().groupBy(_.getLong(2))
      .map { case (cl, rs) => cl -> rs.map(_.getSeq[Int](1)).toSet }
    for (a <- codeSets.keys; b <- codeSets.keys if a < b)
      assert(codeSets(a).intersect(codeSets(b)).isEmpty,
        s"clusters $a and $b share a code word")
    val res = PqIndex.adcSearch(clustered,
      clustered.filter(col("vec_id") < 4), m = 2, kSub = 4,
      k = 5, rerank = 30, nIter = 3).collect()
    // every returned neighbor of query q shares q's planted cluster
    assert(res.nonEmpty)
    assert(res.forall(r => r.getLong(1) % 4 === r.getLong(0) % 4))
  }

  test("rerank at full width reproduces the exact brute-force ranking") {
    val queries = clustered.filter(col("vec_id") < 4)
    val pq = PqIndex.adcSearch(clustered, queries, m = 2, kSub = 4,
      k = 3, rerank = 100, nIter = 2)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = Similarity.bruteForceTopK(queries, clustered, 3)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getLong(2))).toMap
    assert(pq === exact)
  }

  test("results are partition-invariant end to end") {
    val queries = clustered.filter(col("vec_id") < 2)
    def run(p: Int) = PqIndex.adcSearch(clustered.repartition(p), queries,
      m = 2, kSub = 4, k = 4, rerank = 8, nIter = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(run(1) === run(7))
  }

  test("ivfAdc: probing all cells at full rerank equals brute force") {
    val queries = clustered.filter(col("vec_id") < 3)
    val got = PqIndex.ivfAdcSearch(clustered, queries, nLists = 4,
      coarseIter = 2, m = 2, kSub = 4, pqIter = 2,
      k = 3, nProbe = 4, rerank = 100)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = Similarity.bruteForceTopK(queries, clustered, 3)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === exact)
  }

  test("ivfAdc: one probe on clustered data stays in the query's cluster") {
    val res = PqIndex.ivfAdcSearch(clustered,
      clustered.filter(col("vec_id") < 4), nLists = 4, coarseIter = 3,
      m = 2, kSub = 4, pqIter = 3, k = 5, nProbe = 1, rerank = 30)
      .collect()
    assert(res.nonEmpty)
    assert(res.forall(r => r.getLong(1) % 4 === r.getLong(0) % 4))
  }

  test("ivfAdc: partition-invariant") {
    val queries = clustered.filter(col("vec_id") < 2)
    def run(p: Int) = PqIndex.ivfAdcSearch(clustered.repartition(p), queries,
      nLists = 4, coarseIter = 2, m = 2, kSub = 4, pqIter = 2,
      k = 4, nProbe = 2, rerank = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(run(1) === run(5))
  }

  test("rerank < k is refused") {
    val e = intercept[IllegalArgumentException] {
      PqIndex.adcSearch(clustered, clustered.limit(1), m = 2, kSub = 4,
        k = 5, rerank = 4)
    }
    assert(e.getMessage.contains("rerank"))
  }
}
