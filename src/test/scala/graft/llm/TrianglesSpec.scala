package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** Degree-oriented triangle counting: planted cliques and stars,
  * direction/duplicate insensitivity, and randomized equivalence with
  * a brute-force triple enumeration.
  */
class TrianglesSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    LinkRank.triangleCounts(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap

  test("K4: every vertex sits in 3 triangles") {
    val k4 = for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)
    assert(run(k4) === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("star: a hub with spokes has zero triangles everywhere") {
    val star = (1L to 6L).map(i => (0L, i))
    val out = run(star)
    assert(out.size === 7 && out.values.forall(_ === 0L))
  }

  test("direction, self-loops and duplicate edges do not change counts") {
    val base = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val noisy = base ++ Seq((2L, 1L), (3L, 2L), (1L, 1L), (2L, 3L))
    assert(run(base) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    assert(run(noisy) === run(base))
  }

  test("randomized: matches brute-force triple enumeration") {
    val rnd = new scala.util.Random(59)
    val edges = (0 until 150).map(_ =>
      (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong)).filter(e => e._1 != e._2)
    val got = run(edges)
    val und = edges.map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    val verts = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val want = verts.map { v =>
      v -> (for {
        a <- verts; b <- verts if a < b
        if a != v && b != v
        if und((math.min(a, v), math.max(a, v))) &&
          und((math.min(b, v), math.max(b, v))) && und((a, b))
      } yield 1).size.toLong
    }.toMap
    assert(got === want)
  }
}
