package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** Fixture + brute-force tests for the all-pairs sparse cosine join:
  * exact integer score on a hand-computed pair, df pruning semantics,
  * threshold exclusion, and randomized equivalence against a BigInt
  * brute force over all pairs.
  */
class SparseSimSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], maxDf: Long, thrPpm: Long) =
    SparseSim.allPairsCosine(docs.toDF("doc_id", "text"), "doc_id", "text",
        maxDf, thrPpm)
      .select(col("doc_a"), col("doc_b"), col("dot"), col("n2_a"),
        col("n2_b"), col("cos2_ppm"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet

  test("hand-computed pair: tf dot, norms and floor(cos²·1e6) exact") {
    // d1 = {apple:1, banana:2}, d2 = {apple:1, banana:1}
    // dot = 3, n2 = 5 and 2, cos² = 9/10 → 900000 ppm
    val out = run(Seq(1L -> "apple banana banana", 2L -> "apple banana"),
      maxDf = 10L, thrPpm = 500000L)
    assert(out === Set((1L, 2L, 3L, 5L, 2L, 900000L)))
  }

  test("df pruning: a term above maxDf leaves both dots and norms") {
    // "the" appears in all 3 docs; with maxDf=2 it is pruned, so d1/d2
    // share nothing and no pair survives
    val docs = Seq(1L -> "the apple", 2L -> "the banana", 3L -> "the cherry")
    assert(run(docs, maxDf = 2L, thrPpm = 100000L) === Set.empty)
    // with maxDf=3 "the" stays: every pair has dot=1, n2=2 → cos²=1/4
    val out = run(docs, maxDf = 3L, thrPpm = 500000L)
    assert(out.map(t => (t._1, t._2, t._6)) ===
      Set((1L, 2L, 250000L), (1L, 3L, 250000L), (2L, 3L, 250000L)))
  }

  test("threshold edge: cosine exactly at thr is kept, just below is not") {
    // orthogonal-ish: d1={a:1}, d2={a:1,b:1}: cos² = 1/2 → 500000 ppm
    val docs = Seq(1L -> "a", 2L -> "a b")
    // thr = 1/√2: dot²·1e12 = 1e12·1 ; thr²·n2a·n2b = 707106² · 2 ≈ 0.99999e12 → kept
    assert(run(docs, 10L, 707106L).nonEmpty)
    assert(run(docs, 10L, 707107L).isEmpty)
  }

  test("randomized: matches a BigInt brute force over all pairs") {
    val rnd = new scala.util.Random(47)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val docs = (1L to 60L).map { i =>
      i -> Seq.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val maxDf = 40L; val thr = 600000L
    val got = run(docs, maxDf, thr)
    // brute force in exact integer arithmetic
    val tf = docs.map { case (id, t) =>
      id -> t.split("\\s+").toSeq.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    }.toMap
    val df = tf.values.flatMap(_.keys).groupBy(identity).map { case (w, xs) => w -> xs.size }
    val kept = tf.map { case (id, m) => id -> m.filter { case (w, _) => df(w) <= maxDf } }
    val want = (for {
      a <- kept.keys; b <- kept.keys if a < b
      dot = kept(a).keySet.intersect(kept(b).keySet).toSeq
        .map(w => kept(a)(w) * kept(b)(w)).sum
      if dot > 0
      n2a = kept(a).values.map(v => v * v).sum
      n2b = kept(b).values.map(v => v * v).sum
      lhs = BigInt(dot) * dot * 1000000L * 1000000L
      if lhs >= BigInt(thr) * thr * n2a * n2b
      score = (BigInt(dot) * dot * 1000000L / (BigInt(n2a) * n2b)).toLong
    } yield (a, b, dot, n2a, n2b, score)).toSet
    assert(got === want)
  }

  private def runCont(docs: Seq[(Long, String)], maxDf: Long, thrPpm: Long) =
    SparseSim.containmentPairs(docs.toDF("doc_id", "text"), "doc_id", "text",
        maxDf, thrPpm)
      .select(col("contained_id"), col("container_id"), col("shared"),
        col("n_contained"), col("cont_ppm"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet

  test("containment: a quoted paragraph is contained but far from Jaccard-similar") {
    val para = "alpha beta gamma delta epsilon zeta"
    val long = para + " " + (1 to 30).map(i => s"filler$i").mkString(" ")
    val out = runCont(Seq(1L -> para, 2L -> long), maxDf = 10L, thrPpm = 1000000L)
    // para has 4 3-grams, all inside the long doc → containment 1.0
    // in that direction ONLY (the long doc has 35 grams)
    assert(out === Set((1L, 2L, 4L, 4L, 1000000L)))
    // while symmetric cosine at the same bar sees nothing
    assert(run(Seq(1L -> para, 2L -> long), 10L, 800000L).isEmpty)
  }

  test("containment: direction respects each side's own size") {
    // d1 ⊂ d2 at 2/3, d2 ⊄ d1 (2/4 < 0.6)
    val out = runCont(Seq(
      1L -> "a b c d e",              // grams: abc bcd cde
      2L -> "a b c d x p q r s t"),   // grams: abc bcd cdx xpq pqr qrs rst + ...
      maxDf = 10L, thrPpm = 600000L)
    assert(out.map(t => (t._1, t._2)) === Set((1L, 2L)))
    val t = out.head
    assert(t._3 === 2L && t._4 === 3L && t._5 === 666666L)
  }

  test("containment randomized: matches brute force over distinct gram sets") {
    val rnd = new scala.util.Random(61)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val docs = (1L to 40L).map { i =>
      i -> Seq.fill(3 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val maxDf = 30L; val thr = 700000L
    val got = runCont(docs, maxDf, thr)
    def gramsOf(t: String): Set[String] = {
      val ts = t.split("\\s+").toSeq
      if (ts.size < 3) Set.empty
      else ts.sliding(3).map(_.mkString(" ")).toSet
    }
    val g0 = docs.map { case (id, t) => id -> gramsOf(t) }.toMap
    val df = g0.values.flatten.groupBy(identity).map { case (g, xs) => g -> xs.size }
    val g = g0.map { case (id, s) => id -> s.filter(df(_) <= maxDf) }
    val want = (for {
      a <- g.keys; b <- g.keys if a != b
      sh = g(a).intersect(g(b)).size.toLong
      na = g(a).size.toLong
      if na > 0 && sh * 1000000L >= thr * na
    } yield (a, b, sh, na, sh * 1000000L / na)).toSet
    assert(got === want)
  }

  test("plan: pairs meet only through the term join; df prune is a " +
      "broadcast anti-join (hot terms filtered map-side)") {
    val df = Seq(1L -> "x y", 2L -> "y z").toDF("doc_id", "text")
    val plan = SparseSim.allPairsCosine(df, "doc_id", "text", 10L, 100000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.contains("NestedLoop"), plan)
    assert(plan.contains("LeftAnti") && plan.contains("BroadcastHashJoin"),
      s"df prune should be a broadcast anti-join, not a per-term window:\n$plan")
    assert(!plan.contains("Window"),
      s"no per-term window may buffer a hot term's postings:\n$plan")
  }
}
