package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The r19 Spread parallelism guard: a conditional round-robin
  * repartition for compute-heavy map folds over single-split scans.
  * The contract under test: (1) results are byte-identical — Spread
  * only moves rows; (2) on a tiny single-file scan it widens to
  * defaultParallelism; (3) on a non-file frame it degrades to a
  * repartition (small) or no-op, never a throw; (4) byKey satisfies
  * the downstream join's distribution so no second exchange stacks
  * on top. */
class SpreadSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  test("Spread preserves the exact result set of a fold above it") {
    val base = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    val plain = base
      .select(col("doc_id"), size(TextAnalysis.tokens(col("text"))).as("n"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
    val spread = Spread(base)
      .select(col("doc_id"), size(TextAnalysis.tokens(col("text"))).as("n"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
    assert(spread.toSeq == plain.toSeq)
  }

  test("Spread widens a tiny single-file scan to defaultParallelism") {
    val base = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    val target = spark.sparkContext.defaultParallelism
    assume(target > 1, "needs a multi-core session")
    assert(base.rdd.getNumPartitions < target,
      "precondition: the test file must scan as fewer splits than cores")
    assert(Spread(base).rdd.getNumPartitions == target)
    // and the plan carries the user repartition (AQE cannot coalesce it)
    assert(Spread(base).queryExecution.optimizedPlan.toString
      .contains("Repartition"))
  }

  test("Spread.byKey pre-partitions by the join key without stacking a second exchange") {
    val base = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    val k = Spread.byKey(base, col("doc_id"))
    val joined = k.as("a").join(k.as("b"), Seq("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    // the byKey repartition(s) print as REPARTITION_BY_NUM; the
    // planner must not stack its own ENSURE_REQUIREMENTS hash
    // exchange on top of them
    val ensures = "ENSURE_REQUIREMENTS".r.findAllIn(plan).length
    assert(ensures == 0, s"unexpected stacked exchange:\n$plan")
    // result equality with the un-spread spelling
    val plainN = base.as("a").join(base.as("b"), Seq("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n")).count()
    assert(joined.count() == plainN)
  }

  test("Spread never throws on a non-file in-memory frame") {
    import spark.implicits._
    val mem = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    assert(Spread(mem).collect().length == 2)
    assert(Spread.byKey(mem, col("doc_id")).collect().length == 2)
  }
}
