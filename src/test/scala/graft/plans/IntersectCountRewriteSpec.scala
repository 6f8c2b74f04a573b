package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The injected optimizer rule: the naive SQL spelling compiles to
  * the native `inter_count`, results are unchanged, and spellings the
  * rule cannot prove safe are left alone. */
class IntersectCountRewriteSpec extends AnyFunSuite with SparkTestSession {

  private val Naive =
    "size(array_intersect(sort_array(array_distinct(a)), sort_array(array_distinct(b))))"

  private def arrays = {
    import spark.implicits._
    Seq(
      (Seq(3L, 1L, 2L, 2L), Seq(2L, 4L, 2L, 3L)), // inter {2,3} = 2
      (Seq.empty[Long], Seq(1L, 2L)),             // empty side
      (Seq(5L, 5L), Seq(5L)),                     // dup-collapse = 1
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)))         // disjoint = 0
      .toDF("a", "b")
      // keep a real exchange under the projection so ConvertToLocal-
      // Relation cannot pre-evaluate the expression out of the plan
      .repartition(2)
  }

  test("provably sorted-distinct spelling rewrites to inter_count") {
    val df = arrays.select(expr(Naive).as("n"))
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("inter_count"),
      s"expected the rule to fire, optimized plan:\n$opt")
    assert(!opt.toLowerCase.contains("array_intersect"),
      s"naive intersect survived:\n$opt")
    assert(df.collect().map(_.getInt(0)).toSeq.sorted === Seq(0, 0, 1, 2))
  }

  test("null input stays NULL through the rewrite (non-legacy size)") {
    val df = arrays
      .select(when(lit(false), col("a")).as("a"), col("b")) // a := NULL
      .select(expr(Naive).as("n"))
    assert(df.queryExecution.optimizedPlan.toString.contains("inter_count"))
    assert(df.collect().forall(_.isNullAt(0)))
  }

  test("null ELEMENTS shared by both sides count once, matching array_intersect") {
    // user SQL over nullable-element arrays must see identical results
    // with and without the rewrite: Spark's size(array_intersect)
    // counts a shared null exactly once, and so must inter_count
    import spark.implicits._
    val df = Seq(
      (Seq[Option[Long]](Some(3L), None, Some(1L), None),
        Seq[Option[Long]](None, Some(3L), Some(4L))),    // {null,3} = 2
      (Seq[Option[Long]](None), Seq[Option[Long]](Some(1L))), // one-sided null = 0
      (Seq[Option[Long]](None), Seq[Option[Long]](None)))     // null-only = 1
      .toDF("a", "b").repartition(2)
      .select(expr(Naive).as("n"))
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("inter_count"),
      s"rule should fire on nullable-element BIGINT arrays:\n$opt")
    assert(df.collect().map(_.getInt(0)).toSeq.sorted === Seq(0, 1, 2))
  }

  test("unprovable spellings are left alone") {
    // bare columns: sortedness not provable plan-locally
    val bare = arrays.select(expr("size(array_intersect(a, b))").as("n"))
    val optBare = bare.queryExecution.optimizedPlan.toString
    assert(!optBare.contains("inter_count"), s"rule overfired:\n$optBare")
    // distinct but NOT sorted: contract violation, must not rewrite
    val noSort =
      arrays.select(expr("size(array_intersect(array_distinct(a), array_distinct(b)))").as("n"))
    assert(!noSort.queryExecution.optimizedPlan.toString.contains("inter_count"))
    // sorted DESCENDING: wrong direction for the two-pointer walk
    val desc = arrays.select(expr(
      "size(array_intersect(sort_array(array_distinct(a), false), sort_array(array_distinct(b))))").as("n"))
    assert(!desc.queryExecution.optimizedPlan.toString.contains("inter_count"))
    // non-BIGINT elements: inter_count is ARRAY<BIGINT>-only
    val ints = {
      import spark.implicits._
      Seq((Seq(1, 2), Seq(2, 3))).toDF("a", "b")
        .select(expr(Naive).as("n"))
    }
    assert(!ints.queryExecution.optimizedPlan.toString.contains("inter_count"))
    assert(ints.collect().map(_.getInt(0)).toSeq === Seq(1))
  }

  test("q260's naive spelling compiles through the rule") {
    val df = graft.queries.SimilarityQueries
      .queries("q260_source_overlap")(spark, "/root/testdata/sf0.001")
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("inter_count"), s"rule did not fire in q260:\n$opt")
    assert(!opt.toLowerCase.contains("array_intersect"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    // overlap can never exceed either set
    rows.foreach { r =>
      val (sa, sb, ov) = (r.getInt(2), r.getInt(3), r.getInt(4))
      assert(ov <= math.min(sa, sb) && ov >= 0)
    }
  }
}
