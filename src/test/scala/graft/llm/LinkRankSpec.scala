package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Fixed-point PageRank: hand-computed small graphs, invariants, and
  * partition independence. */
class LinkRankSpec extends AnyFunSuite with SparkTestSession {

  private def edgesDF(es: (Long, Long)*) = {
    import spark.implicits._
    es.toDF("src", "dst")
  }

  test("3-cycle: symmetric graph stays uniform at every iteration") {
    val e = edgesDF((0L, 1L), (1L, 2L), (2L, 0L))
    val scale = 3000000L
    val pr = LinkRank.pageRankFp(e, nIter = 4, scale = scale)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // uniform start 1000000 each; every node receives exactly what it
    // emits: base + 85% of 1000000 = 150000/3*... compute: base =
    // (3000000*15) div (3*100) = 150000; share = 1000000; pr1 =
    // 150000 + 850000 = 1000000 — a fixed point, all iterations equal
    assert(pr.values.toSet === Set(1000000L))
  }

  test("star graph: the hub outranks the spokes, exact values") {
    // spokes 1,2,3 -> hub 0; hub -> 1 (so the hub has outdeg > 0)
    val e = edgesDF((1L, 0L), (2L, 0L), (3L, 0L), (0L, 1L))
    val scale = 4000000L
    val got = LinkRank.pageRankFp(e, nIter = 1, scale = scale)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // n=4, pr0 = 1000000 each, base = (4000000*15) div 400 = 150000
    // hub receives 3 shares of 1000000 → 150000 + (85*3000000) div 100
    val hub = 150000L + (85L * 3000000L) / 100L
    // node 1 receives the hub's share → 150000 + 850000
    val spoke1 = 150000L + (85L * 1000000L) / 100L
    assert(got(0L) === hub)
    assert(got(1L) === spoke1)
    assert(got(2L) === 150000L && got(3L) === 150000L)
    assert(got(0L) > got(1L) && got(1L) > got(2L))
  }

  test("nIter=0 returns the uniform start; dampNum=0 returns base only") {
    val e = edgesDF((0L, 1L), (1L, 0L), (2L, 0L))
    val uniform = LinkRank.pageRankFp(e, nIter = 0, scale = 900L)
      .collect().map(_.getLong(1)).toSet
    assert(uniform === Set(300L))
    val baseOnly = LinkRank.pageRankFp(e, nIter = 2, scale = 900L, dampNum = 0L)
      .collect().map(_.getLong(1)).toSet
    assert(baseOnly === Set(300L)) // (900*100) div (100*3)
  }

  test("dangling mass evaporates; in-link-less nodes settle at base") {
    // 0 -> 1, 1 is dangling; 2 isolated-but-linked: 2 -> 1
    val e = edgesDF((0L, 1L), (2L, 1L))
    val got = LinkRank.pageRankFp(e, nIter = 2, scale = 3000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = (3000000L * 15L) / 300L
    assert(got(0L) === base && got(2L) === base)
    assert(got(1L) > got(0L))
    // total mass strictly below scale: the dangling node absorbs and
    // the floor losses shave
    assert(got.values.sum < 3000000L)
  }

  test("partition-invariant: longs sum the same on any layout") {
    import spark.implicits._
    val es = (0L until 200L).flatMap(u => Seq((u, (u * 7 + 13) % 200),
      (u, (u * 7 + 26) % 200))).filter { case (a, b) => a != b }
    val a = LinkRank.pageRankFp(es.toDF("src", "dst").repartition(1), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = LinkRank.pageRankFp(es.toDF("src", "dst").repartition(17), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b)
  }

  test("khopDistances: BFS layers, depth cap, multi-seed min") {
    import spark.implicits._
    // chain 0→1→2→3→4, depth 2 from seed 0: nodes 3,4 unreached
    val chain = edgesDF((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
    val got = LinkRank.khopDistances(chain, Seq(0L).toDF("v"), 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 0L, 1L -> 1L, 2L -> 2L))
    // two seeds: every vertex takes the NEARER seed's layer, and a
    // seed reachable from another seed keeps distance 0
    val g = edgesDF((0L, 2L), (2L, 3L), (1L, 3L), (3L, 0L))
    val multi = LinkRank.khopDistances(g, Seq(0L, 1L).toDF("v"), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(multi === Map(0L -> 0L, 1L -> 0L, 2L -> 1L, 3L -> 1L))
    // depth 0 is just the seed set
    val d0 = LinkRank.khopDistances(chain, Seq(0L).toDF("v"), 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d0 === Map(0L -> 0L))
  }

  test("hitsFp: star center is the sole hub, leaves the authorities; " +
      "shared-authority hubs tie") {
    val S = 1000000000000L
    // star: 0 → 1,2,3
    val star = LinkRank.hitsFp(edgesDF((0L, 1L), (0L, 2L), (0L, 3L)), 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(star === Map(0L -> (S, 0L), 1L -> (0L, S), 2L -> (0L, S),
      3L -> (0L, S)))
    // two hubs pointing at one shared authority score identically
    val bi = LinkRank.hitsFp(edgesDF((10L, 1L), (11L, 1L)), 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(bi(10L) == bi(11L) && bi(10L)._1 == S && bi(1L)._2 == S)
  }

  test("personalizedPageRankFp: mass flows only from seeds; unreached nodes score 0") {
    import spark.implicits._
    val S = 1000000000000L
    // chain 0 → 1 → 2, plus isolated pair 8 → 9; seed = {0}
    val g = edgesDF((0L, 1L), (1L, 2L), (8L, 9L))
    val got = LinkRank.personalizedPageRankFp(g, Seq(0L).toDF("v"), 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hand replay: p0 = (S,0,0,0,0); base(0) = 15% of S
    val base = (S * 15L) / 100L
    val p1 = Map(0L -> base, 1L -> (85L * S) / 100L, 2L -> 0L, 8L -> 0L, 9L -> 0L)
    val p2 = Map(0L -> base, 1L -> (85L * p1(0L)) / 100L,
      2L -> (85L * p1(1L)) / 100L, 8L -> 0L, 9L -> 0L)
    assert(got === p2)
    assert(got(8L) == 0L && got(9L) == 0L,
      "components unreached from the seeds must hold zero mass")
  }
}
