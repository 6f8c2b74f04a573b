package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The r19 Spread parallelism guard (width re-derived r20): a
  * conditional round-robin repartition for compute-heavy map folds
  * over single-split scans. The contract under test: (1) results are
  * byte-identical — Spread only moves rows; (2) on a tiny single-file
  * scan it widens to the INPUT-derived width (bytes/1MiB, floored at
  * MinSmallWidth, capped at cores — r19 verdict ask #1: the old
  * defaultParallelism constant over-sharded at 32 cores); (3) a
  * non-file in-memory frame has unknown size and must stay a NO-OP
  * (ADVICE r19 — previously it repartitioned unconditionally);
  * (4) byKey satisfies the downstream join's distribution so no
  * second exchange stacks on top. */
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

  test("Spread widens a tiny single-file scan to the input-derived width") {
    val base = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    val target = spark.sparkContext.defaultParallelism
    assume(target > 1, "needs a multi-core session")
    assert(base.rdd.getNumPartitions < target,
      "precondition: the test file must scan as fewer splits than cores")
    // width = min(cores, max(MinSmallWidth, bytes/1MiB)) — at the
    // 4-core test session the cap binds, so the width equals cores;
    // the formula itself is pinned separately below
    val expected = Spread.smallScanWidth(base)
    assert(expected.nonEmpty, "guard must fire on the tiny test scan")
    assert(Spread(base).rdd.getNumPartitions == expected.get)
    assert(expected.get <= target && expected.get >= 1)
    // and the plan carries the user repartition (AQE cannot coalesce it)
    assert(Spread(base).queryExecution.optimizedPlan.toString
      .contains("Repartition"))
  }

  test("smallScanWidth derives from input bytes, floored and capped") {
    val base = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    val target = spark.sparkContext.defaultParallelism
    val conf = spark.sparkContext.hadoopConfiguration
    val bytes = base.inputFiles.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(conf).getFileStatus(p).getLen
    }.sum
    val w = math.min(target.toLong,
      math.max(Spread.MinSmallWidth.toLong,
        bytes / Spread.SmallBytesPerPartition))
    assert(Spread.smallScanWidth(base).contains(w.toInt))
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

  test("Spread is a NO-OP on a non-file in-memory frame (unknown size = big)") {
    import spark.implicits._
    val mem = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    // ADVICE r19: inputFiles is EMPTY (not a throw) for in-memory
    // frames — a large non-file production frame must not eat a full
    // round-robin shuffle just because its size is unreadable
    assert(Spread.smallScanWidth(mem).isEmpty)
    assert(Spread(mem) eq mem)
    assert(Spread.byKey(mem, col("doc_id")) eq mem)
    assert(Spread(mem).collect().length == 2)
  }
}
