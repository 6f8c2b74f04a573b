package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** IVF coarse-quantizer ANN: cell assignment, probe behavior, and
  * recall against the exact brute-force path on clustered data. */
class IvfSpec extends AnyFunSuite with SparkTestSession {

  /** 4 well-separated unit-ish clusters of 25 vectors each. */
  private lazy val clustered = {
    import spark.implicits._
    val centers = Seq(
      Array.tabulate(16)(i => if (i < 4) 1.0f else 0.0f),
      Array.tabulate(16)(i => if (i >= 4 && i < 8) 1.0f else 0.0f),
      Array.tabulate(16)(i => if (i >= 8 && i < 12) 1.0f else 0.0f),
      Array.tabulate(16)(i => if (i >= 12) 1.0f else 0.0f))
    (0 until 100).map { id =>
      val c = centers(id % 4)
      // deterministic small perturbation
      val v = c.zipWithIndex.map { case (x, j) =>
        x + 0.01f * (((id * 31 + j * 7) % 11) - 5)
      }
      (id.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  test("vectors of one cluster land in one cell; probes find it") {
    val model = IvfIndex.fit(clustered, nLists = 4)
    assert(model.nLists == 4)
    val assigned = IvfIndex.assign(clustered, model)
    // each true cluster maps to exactly one learned cell
    val cellsPerCluster = assigned
      .withColumn("cluster", col("vec_id") % 4)
      .groupBy("cluster").agg(countDistinct("cell").as("n"))
      .collect().map(_.getLong(1))
    assert(cellsPerCluster.forall(_ == 1L))
  }

  test("nProbe=1 search recalls brute-force top-k on clustered data") {
    val model = IvfIndex.fit(clustered, nLists = 4)
    val indexed = IvfIndex.assign(clustered, model)
    val queries = clustered.filter(col("vec_id") < 4)
    val ivf = IvfIndex.search(queries, indexed, model, k = 5, nProbe = 1)
      .select("query_id", "vec_id", "rn").collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap
    val exact = Similarity.bruteForceTopK(queries, clustered, 5)
      .select("query_id", "vec_id", "rn").collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap
    // same-cluster neighbors dominate the exact top-5, so probing the
    // single home cell reproduces it
    assert(ivf == exact)
  }

  test("more probes never shrink the candidate set") {
    val model = IvfIndex.fit(clustered, nLists = 4)
    val indexed = IvfIndex.assign(clustered, model)
    val queries = clustered.filter(col("vec_id") === 0)
    val n1 = IvfIndex.search(queries, indexed, model, k = 100, nProbe = 1).count()
    val n2 = IvfIndex.search(queries, indexed, model, k = 100, nProbe = 2).count()
    val n4 = IvfIndex.search(queries, indexed, model, k = 100, nProbe = 4).count()
    assert(n1 <= n2 && n2 <= n4)
    assert(n4 == 100) // probing all cells = full corpus
  }

  test("seededSearch: scan-local cell assignment — no cross join, one window") {
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    import org.apache.spark.sql.execution.window.WindowExec
    val out = IvfIndex.seededSearch(clustered,
      clustered.filter(col("vec_id") < 4), nLists = 4, k = 5, nProbe = 2)
    val all = graft.PlanNodes.all(out.queryExecution.executedPlan)
    // the old formulation cross-joined the corpus with the seed set
    // and ranked corpus×nLists embedding rows through a window
    assert(!all.exists(_.isInstanceOf[CartesianProductExec]),
      "seededSearch reintroduced a corpus×seeds cross join")
    assert(all.count(_.isInstanceOf[WindowExec]) == 1,
      "only the final per-query top-k should be a window")
  }

  test("seededSearch with nProbe = nLists equals brute force") {
    // probing every cell removes the approximation entirely, so the
    // collected-codebook assignment path must reproduce the exact
    // fixed-point scores and tie-breaks of bruteForceTopK
    val queries = clustered.filter(col("vec_id") < 4)
    val ivf = IvfIndex.seededSearch(clustered, queries, nLists = 4, k = 5, nProbe = 4)
      .select("query_id", "vec_id", "dot_fp", "rn").collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = Similarity.bruteForceTopK(queries, clustered, 5)
      .select("query_id", "vec_id", "dot_fp", "rn").collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getLong(2))).toMap
    assert(ivf == exact)
  }

  test("seededSearch tolerates null and wrong-dimension embeddings") {
    import spark.implicits._
    val base = (0 until 20).map(i =>
      (i.toLong, Seq.tabulate(16)(j => (i * 16 + j).toFloat / 100)))
    val dirty = base.toDF("vec_id", "embedding")
      .unionByName(Seq((100L, null.asInstanceOf[Seq[Float]])).toDF("vec_id", "embedding"))
      .unionByName(Seq((101L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding"))
    val out = IvfIndex.seededSearch(dirty, dirty.filter(col("vec_id") < 2),
      nLists = 4, k = 3, nProbe = 2)
    val ids = out.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(out.count() > 0)
    assert(!ids.contains(100L) && !ids.contains(101L)) // dropped, not crashed
  }

  test("seededSearch: null codebook seed fails loudly; double embeddings widen") {
    import spark.implicits._
    // a null embedding IN the first-nLists codebook prefix must not NPE
    // the driver mid-collect — it fails with the offending seed id
    val nullSeed = Seq((0L, Seq(1.0f, 0.0f)), (1L, null.asInstanceOf[Seq[Float]]))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      IvfIndex.seededSearch(nullSeed, nullSeed, nLists = 2, k = 1, nProbe = 1)
    }
    assert(e.getMessage.contains("null embedding"))
    // an array<double> embedding column (dot_fp accepts it) must not
    // ClassCastException the seed collect
    val dbl = (0 until 8).map(i =>
      (i.toLong, Seq.tabulate(4)(j => (i * 4 + j).toDouble / 10)))
      .toDF("vec_id", "embedding")
    val out = IvfIndex.seededSearch(dbl, dbl.filter(col("vec_id") < 2),
      nLists = 4, k = 1, nProbe = 4)
      .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // unnormalized dot similarity: the largest-norm vector (id 7) tops
    // every query — the point is the widened arithmetic ran, not recall
    assert(out == Map(0L -> 7L, 1L -> 7L))
  }

  test("fitFixedPoint: partition-invariant centroids that recover planted clusters") {
    // the property that makes the trained path oracle-able: centroids
    // are a pure integer function of the data, so any partitioning
    // yields identical codebooks
    val a = IvfIndex.fitFixedPoint(clustered, nLists = 4, nIter = 3)
    val b = IvfIndex.fitFixedPoint(clustered.repartition(7), nLists = 4, nIter = 3)
    val c = IvfIndex.fitFixedPoint(clustered.repartition(1), nLists = 4, nIter = 3)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.map(_.toSeq).toSeq == c.map(_.toSeq).toSeq)
    // and the learned codebook separates the 4 planted clusters: after
    // training, each cluster's vectors share one cell (Lloyd converged
    // to the cluster structure, not the arbitrary seed prefix)
    val bcLike = a.map(_.clone())
    def cellOf(v: Array[Float]): Int = {
      val e = v.map(x => math.floor(x.toDouble * 1e6).toLong)
      bcLike.zipWithIndex.minBy { case (cc, i) =>
        (cc.zip(e).map { case (x, y) => val d = x - y; d * d }.sum, i)
      }._2
    }
    val rows = clustered.collect().map(r =>
      (r.getLong(0) % 4, cellOf(r.getSeq[Float](1).toArray)))
    assert(rows.groupBy(_._1).values.forall(_.map(_._2).distinct.size == 1),
      "a planted cluster straddles cells after training")
  }

  test("fixedPointSearch: nProbe = nLists equals brute force; recall floor at nProbe=2") {
    // probing everything removes the approximation — exact scores and
    // tie-breaks must match bruteForceTopK (same dot_fp rerank)
    val queries = clustered.filter(col("vec_id") < 4)
    val all = IvfIndex.fixedPointSearch(clustered, queries, nLists = 4, k = 5, nProbe = 4)
      .select("query_id", "vec_id", "dot_fp", "rn").collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = Similarity.bruteForceTopK(queries, clustered, 5)
      .select("query_id", "vec_id", "dot_fp", "rn").collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getLong(2))).toMap
    assert(all == exact)
    // trained quantizer on the real test embeddings: recall floor at
    // the q66 parameters (the quality contract the oracle cannot see)
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))
    val q8 = emb.filter(col("vec_id") < 8)
    val ivf = IvfIndex.fixedPointSearch(emb, q8, nLists = 16, k = 5, nProbe = 4)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bf = Similarity.bruteForceTopK(q8, emb, 5)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ivf & bf).size.toDouble / bf.size
    assert(recall >= 0.5, f"fixed-point trained IVF recall@5 degraded to $recall%.2f")
  }

  test("semanticDedup: one survivor per planted cluster, lowest id, all rows out") {
    // within-cluster dots are ~3.6e6 (4 shared near-unit dims), cross-
    // cluster dots are perturbation noise — 2e6 separates them cleanly
    val out = IvfIndex.semanticDedup(clustered, nLists = 4,
      minDotFp = 2000000L, nIter = 3)
      .select("vec_id", "cell", "n_dup_of", "kept").collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getLong(2), r.getBoolean(3))))
    assert(out.length == 100, "every input id must reach the output")
    val kept = out.filter(_._2._3).map(_._1).sorted
    // exactly one representative per cell = per planted cluster, and it
    // is that cluster's minimum id (ids 0..3 are each cluster's min)
    assert(kept.toSeq == Seq(0L, 1L, 2L, 3L), s"kept = ${kept.toSeq}")
    // every duplicate counts at least its cluster-min as a lower match
    assert(out.filterNot(_._2._3).forall(_._2._2 >= 1L))
  }

  test("semanticDedup: rank-truncation cap bounds pair work, later members pass through kept") {
    // cap = 10 < 25-member cells: within each cell only the first 10
    // ids compare (1 survivor + 9 dups); ranks 11..25 are outside the
    // guard and pass through as kept with n_dup_of = 0
    val out = IvfIndex.semanticDedup(clustered, nLists = 4,
      minDotFp = 2000000L, nIter = 3, maxCellSize = 10).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3)))
    assert(out.length == 100, "truncation must not drop rows from the output")
    assert(out.count(_._4) == 4 + (100 - 4 * 10),
      "per cell: 1 survivor among the first 10, 15 uncompared pass-throughs")
    // an uncapped run with a cap larger than any cell is a no-op
    val a = IvfIndex.semanticDedup(clustered, 4, 2000000L, 3, maxCellSize = 0)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3))).toSet
    val b = IvfIndex.semanticDedup(clustered, 4, 2000000L, 3, maxCellSize = 1000)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3))).toSet
    assert(a == b)
  }

  test("semanticDedup: in-cell pairing is an equi-join on cell, never a cartesian") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    val out = IvfIndex.semanticDedup(clustered, nLists = 4,
      minDotFp = 2000000L, nIter = 1, maxCellSize = 10)
    val all = graft.PlanNodes.all(out.queryExecution.executedPlan)
    assert(!all.exists(_.isInstanceOf[CartesianProductExec]),
      "semanticDedup degenerated to an all-pairs cartesian")
    // a dropped equi-key would plan as BroadcastNestedLoopJoin at test
    // scale (small side broadcast), not CartesianProduct — forbid both
    assert(!all.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      "semanticDedup degenerated to a broadcast nested-loop join")
  }

  test("semanticDedup with nLists=1 equals brute-force all-pairs dedup") {
    // one cell removes the clustering approximation entirely: every
    // pair is compared, so the verdicts must equal a hand-rolled
    // all-pairs sweep with the same threshold and survivor rule
    val T = 2000000L
    val got = IvfIndex.semanticDedup(clustered, nLists = 1, minDotFp = T, nIter = 0)
      .collect().map(r => (r.getLong(0), (r.getLong(2), r.getBoolean(3)))).toMap
    val vecs = clustered.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    def dotFp(a: Array[Float], b: Array[Float]): Long =
      a.zip(b).map { case (x, y) => math.floor(x.toDouble * y.toDouble * 1e6).toLong }.sum
    val expected = vecs.map { case (id, v) =>
      val nDup = vecs.count { case (id2, v2) => id2 < id && dotFp(v2, v) >= T }
      id -> ((nDup.toLong, nDup == 0))
    }.toMap
    assert(got == expected)
  }

  test("trained IVF recall@5 vs brute force on the test embeddings") {
    // quantitative contract for the non-oracle (trained k-means) path:
    // fixed seed, fixed data → deterministic recall; pin a floor
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))
    val queries = emb.filter(col("vec_id") < 8)
    val model = IvfIndex.fit(emb, nLists = 16, seed = 42L)
    val indexed = IvfIndex.assign(emb, model)
    val ivf = IvfIndex.search(queries, indexed, model, k = 5, nProbe = 4)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.bruteForceTopK(queries, emb, 5)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ivf & exact).size.toDouble / exact.size
    assert(recall >= 0.5, f"trained-IVF recall@5 degraded to $recall%.2f")
  }

  test("mutualKnnClusters: hub suppression at k=1, chaining at k=2") {
    import spark.implicits._
    // two tight pairs (0,1) and (2,3) plus a hub 4 moderately close to
    // everything — the configuration a radius graph merges and mutual
    // top-k must keep apart
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.99f, 0.1f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(0.1f, 0.99f)),
      (4L, Array(0.7f, 0.7f))).toDF("vec_id", "embedding")
    val k1 = IvfIndex.mutualKnnClusters(emb, nLists = 1, k = 1, nIter = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // hub's top-1 is not mutual (its favorite prefers its pair): three
    // components, labeled by their minima
    assert(k1 === Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 3L -> 2L, 4L -> 4L))
    // at k=2 the hub earns mutual edges to 1 and 3 and chains all five
    val k2 = IvfIndex.mutualKnnClusters(emb, nLists = 1, k = 2, nIter = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(k2.values.toSet === Set(0L), s"one component expected: $k2")
  }

  test("balanceCard: planted clusters give even shares; over-provisioned cells report empty") {
    // 4 planted 25-member clusters, nLists = 4: every cell lands one
    // cluster — exact quarter shares and a radius far below the
    // cross-cluster scale
    val even = IvfIndex.balanceCard(clustered, nLists = 4, nIter = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(even.length === 4)
    assert(even.forall { case (_, n, share, _) => n == 25L && share == 250000L })
    assert(even.map(_._2).sum === 100L)
    // shares are ppm of the corpus and sum to ~1e6 (floor losses only)
    assert(even.map(_._3).sum <= 1000000L && even.map(_._3).sum > 999900L)
    // duplicate seed vectors: the tie rule drains one cell — the empty
    // cell must still surface as a zero row, not vanish
    import spark.implicits._
    val dup = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val over = IvfIndex.balanceCard(dup, nLists = 2, nIter = 0)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(over.length === 2, "one row per provisioned cell, empties included")
    assert(over(1) === ((1, 0L, 0L, 0L)), "empty cell reports zeros")
    assert(over(0)._2 === 3L && over(0)._3 === 1000000L && over(0)._4 > 0L)
  }

  test("graphExpandWithCodebook: recall monotone over probe-1; " +
      "multi-assign graph carries cross-cell edges") {
    // cross-cell edges must exist: under nAssign=1 every edge stays
    // inside one probe-1 cell, and expansion could never repair a
    // boundary miss. A LINE of vectors (no cluster structure) forces
    // cells to be contiguous segments whose edge members' nearest
    // neighbors sit in the adjacent cell — exactly the boundary case
    val line = {
      import spark.implicits._
      (0 until 40).map(i => (i.toLong, Array(i.toFloat / 40f, 0.5f)))
        .toDF("vec_id", "embedding")
    }
    val lcb = IvfIndex.fitFixedPoint(line, nLists = 4, nIter = 3)
    val lcells = IvfIndex.cellAssignments(line, nLists = 4, nIter = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val lcross = IvfIndex.knnGraphWithCodebook(line, lcb, k = 3, nAssign = 2)
      .collect().count(r => lcells(r.getLong(0)) != lcells(r.getLong(1)))
    assert(lcross > 0, "nAssign=2 graph must contain cross-cell edges")
    val cb = IvfIndex.fitFixedPoint(clustered, nLists = 4, nIter = 3)
    val edges = IvfIndex.knnGraphWithCodebook(clustered, cb, k = 3,
      nAssign = 2)
    val q = clustered.filter(col("vec_id") < 10L)
    val truth = Similarity.bruteForceTopK(q, clustered, 3)
    def hitsOf(run: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      Similarity.recallAtK(truth, Seq("m" -> run), 3)
        .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val base = hitsOf(IvfIndex.searchWithCodebook(clustered, q, cb, 3, 1))
    val exp = hitsOf(
      IvfIndex.graphExpandWithCodebook(clustered, q, cb, edges, 3))
    // exact rerank over a SUPERSET of the seeds can only keep or gain
    // true hits (anything displacing a true hit has a higher exact
    // dot and is therefore itself a true hit) — per query, not just
    // on average
    base.keys.foreach { qid =>
      assert(exp(qid) >= base(qid),
        s"query $qid: expansion lost recall (${base(qid)} -> ${exp(qid)})")
    }
  }

  test("mutualKnnClusters: every input id labeled, cap survivors singleton") {
    // cap = 10 on 25-member cells: ranks 11..25 never enter the pair
    // frame, so they must come back as singletons, and nothing drops
    val out = IvfIndex.mutualKnnClusters(clustered, nLists = 4, k = 3,
      nIter = 3, maxCellSize = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(out.length == 100, "every input id must reach the output")
    val labels = out.toMap
    val uncompared = out.filter { case (id, cl) => cl == id }
    assert(uncompared.length >= 100 - 4 * 10,
      "cap-truncated members must surface as singletons")
    // labels are component minima: no label exceeds its member
    assert(out.forall { case (id, cl) => cl <= id })
    assert(labels.size == 100)
  }
  // ------------------- graphDelta / ivfDelta -------------------

  private def edgeSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("graphDelta: fold == rebuild on clustered data, arrivals = top id decile") {
    import spark.implicits._
    val (old, arr) = (clustered.filter(col("vec_id") < 90),
      clustered.filter(col("vec_id") >= 90))
    val cb = IvfIndex.fitFixedPoint(clustered, 4, 2)
    val folded = IvfIndex.graphDelta(old, arr, cb,
      IvfIndex.multiAssignments(old, cb, 2),
      IvfIndex.knnGraphWithCodebook(old, cb, 3, 0, 2), 3, 0, 2)
    val rebuilt = IvfIndex.knnGraphWithCodebook(clustered, cb, 3, 0, 2)
    assert(edgeSet(folded) === edgeSet(rebuilt),
      "folded graph must equal the rebuild edge-for-edge")
  }

  test("graphDelta under the cell cap: full cells reject arrivals exactly like the rebuild") {
    import spark.implicits._
    val cap = 10 // each 25-member cluster cell is already over cap
    val (old, arr) = (clustered.filter(col("vec_id") < 90),
      clustered.filter(col("vec_id") >= 90))
    val cb = IvfIndex.fitFixedPoint(clustered, 4, 2)
    val folded = IvfIndex.graphDelta(old, arr, cb,
      IvfIndex.multiAssignments(old, cb, 2),
      IvfIndex.knnGraphWithCodebook(old, cb, 3, cap, 2), 3, cap, 2)
    val rebuilt = IvfIndex.knnGraphWithCodebook(clustered, cb, 3, cap, 2)
    assert(edgeSet(folded) === edgeSet(rebuilt),
      "rank truncation must arbitrate identically on fold and rebuild")
    // monotone-id precondition makes old survivors stable: no arrival
    // (id >= 90) can appear in a first-choice cell already at cap
    assert(!edgeSet(folded).exists(e => e._1 >= 90L || e._2 >= 90L),
      "over-cap cells must reject every arrival")
  }

  test("graphDelta reverse patch: an arrival evicts a touched node's weakest edge") {
    import spark.implicits._
    // one cell (nLists = 1): u's k=1 edge must flip to the closer arrival
    val old = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.6f, 0.8f))).toDF("vec_id", "embedding")
    val arr = Seq((10L, Array(0.99f, 0.1f))).toDF("vec_id", "embedding")
    val all = old.unionByName(arr)
    val cb = IvfIndex.fitFixedPoint(old, 1, 1)
    val folded = IvfIndex.graphDelta(old, arr, cb,
      IvfIndex.multiAssignments(old, cb, 1),
      IvfIndex.knnGraphWithCodebook(old, cb, 1, 0, 1), 1, 0, 1)
    val rebuilt = IvfIndex.knnGraphWithCodebook(all, cb, 1, 0, 1)
    assert(edgeSet(folded) === edgeSet(rebuilt))
    val bySrc = edgeSet(folded).groupBy(_._1)
    assert(bySrc(0L).head._2 === 10L, "node 0's top-1 must flip to the arrival")
    assert(bySrc(10L).head._2 === 0L)
  }

  test("graphDelta with no arrivals is the identity; ivfDelta == rebuild row-for-row") {
    import spark.implicits._
    val cb = IvfIndex.fitFixedPoint(clustered, 4, 2)
    val edges = IvfIndex.knnGraphWithCodebook(clustered, cb, 3, 0, 2)
    val none = clustered.filter(lit(false))
    assert(edgeSet(IvfIndex.graphDelta(clustered, none, cb,
      IvfIndex.multiAssignments(clustered, cb, 2), edges, 3, 0, 2))
      === edgeSet(edges))
    val (old, arr) = (clustered.filter(col("vec_id") < 90),
      clustered.filter(col("vec_id") >= 90))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(rows(IvfIndex.ivfDelta(IvfIndex.multiAssignments(old, cb, 2),
        arr, cb, 2))
      === rows(IvfIndex.multiAssignments(clustered, cb, 2)))
  }
  test("graphErase: fold == rebuild-without; cap resurrection admits the next member") {
    import spark.implicits._
    // one cell (nLists = 1), cap 3: compared = {0,1,2}; erasing 1
    // must resurrect 3 into comparison, exactly like the rebuild
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.8f, 0.2f)), (3L, Array(0.7f, 0.3f)),
      (4L, Array(0.6f, 0.4f)), (5L, Array(0.5f, 0.5f)))
      .toDF("vec_id", "embedding")
    val cb = IvfIndex.fitFixedPoint(vecs, 1, 1)
    val assigned = IvfIndex.multiAssignments(vecs, cb, 1)
    val edges = IvfIndex.knnGraphWithCodebook(vecs, cb, 2, 3, 1)
    val erase = Seq(Tuple1(1L)).toDF("vec_id")
    val folded = IvfIndex.graphErase(vecs, erase, assigned, edges, 2, 3)
    val rebuilt = IvfIndex.knnGraphWithCodebook(
      vecs.filter(col("vec_id") =!= 1L), cb, 2, 3, 1)
    assert(edgeSet(folded) === edgeSet(rebuilt),
      "erase fold must equal the rebuild over survivors")
    val srcs = edgeSet(folded).map(_._1)
    assert(srcs === Set(0L, 2L, 3L), "3 must resurrect; 4/5 stay capped out")
    assert(!edgeSet(folded).exists(e => e._2 == 1L), "no edge may point at the erased id")
  }

  test("graphErase: untouched cells pass through byte-identical; erase folds compose with appends") {
    import spark.implicits._
    val (old, arr) = (clustered.filter(col("vec_id") < 90),
      clustered.filter(col("vec_id") >= 90))
    val cb = IvfIndex.fitFixedPoint(clustered, 4, 2)
    val assigned = IvfIndex.multiAssignments(clustered, cb, 2)
    val edges = IvfIndex.knnGraphWithCodebook(clustered, cb, 3, 0, 2)
    // erase the arrivals back out: erase(delta(old)) == old graph
    val folded = IvfIndex.graphErase(clustered,
      arr.select(col("vec_id")), assigned, edges, 3, 0)
    val rebuilt = IvfIndex.knnGraphWithCodebook(old, cb, 3, 0, 2)
    assert(edgeSet(folded) === edgeSet(rebuilt),
      "erasing the last append must land back on the old graph")
    // ivfErase is the lists' anti-join twin
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(rows(IvfIndex.ivfErase(assigned, arr.select(col("vec_id"))))
      === rows(IvfIndex.multiAssignments(old, cb, 2)))
  }
}
