package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTestSession}

/** Plan-shape guards for the two queries that previously funneled the
  * corpus through a single task: q44 (global prefix-sum window) and
  * q40 (per-language rank window). The scale property under test: a
  * window with an EMPTY partition spec (single-partition sort) may
  * only run over aggregated data — bounded by group count — never over
  * raw corpus rows.
  */
class WindowScaleSpec extends AnyFunSuite with SparkTestSession {

  private val Dir = "/root/testdata/sf0.001"

  private val allNodes = graft.PlanNodes.all _

  private def assertGlobalWindowsAggregated(df: DataFrame, name: String): Seq[WindowExec] = {
    val nodes = allNodes(df.queryExecution.executedPlan)
    val windows = nodes.collect { case w: WindowExec => w }
    windows.filter(_.partitionSpec.isEmpty).foreach { w =>
      val aggBelow = allNodes(w.child).exists(_.isInstanceOf[BaseAggregateExec])
      assert(aggBelow,
        s"$name: global (single-partition) window runs over un-aggregated corpus rows:\n" +
          w.treeString)
    }
    windows
  }

  test("q44 sequence packing: no single-partition window over corpus rows") {
    val df = SparkEntry.queries("q44_sequence_packing")(spark, Dir)
    val windows = assertGlobalWindowsAggregated(df, "q44")
    // the corpus-sized cumulative sum must be the sharded (partitioned)
    // window — its sort is split across shards
    assert(windows.exists(_.partitionSpec.nonEmpty),
      "q44 lost its per-shard prefix-sum window")
    // the offsets branch must REUSE the main branch's shard shuffle
    // (one corpus scan + tokenize, not two) — visible only in the
    // final adaptive plan, hence the collect first
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("ReusedExchange"),
      "q44's offsets branch re-scans the corpus instead of reusing the shard exchange")
  }

  test("q44 two-level prefix sum matches the global-window formulation") {
    // bit-exactness of the rewrite: compare against the naive global
    // window on the same input (fine at spec scale)
    import org.apache.spark.sql.expressions.Window
    val d = graft.Tables.documents(spark, Dir)
      .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).cast("bigint").as("n_tok"))
    val w = Window.orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = d.withColumn("cum", sum(col("n_tok")).over(w) - col("n_tok"))
      .select("doc_id", "n_tok", "cum").collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val got = Packing.exclusivePrefixSum(d, "doc_id", "n_tok", shardSize = 37L)
      .select("doc_id", "cum").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == expected)
  }

  test("exclusivePrefixSum survives caller columns named like its internals") {
    import spark.implicits._
    val df = Seq((0L, 10L, "x"), (1L, 5L, "y"), (2L, 7L, "z"))
      .toDF("id", "w", "_shard")
    val out = Packing.exclusivePrefixSum(df, "id", "w", shardSize = 2L)
    assert(out.columns.contains("_shard")) // caller's column preserved
    val cums = out.select("id", "cum").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(cums == Map(0L -> 0L, 1L -> 10L, 2L -> 15L))
    // refuses to silently clobber an existing output column
    intercept[IllegalArgumentException] {
      Packing.exclusivePrefixSum(df.withColumnRenamed("_shard", "cum"), "id", "w", 2L)
    }
    // dotted column names survive both the expr and the window path
    val dotted = Seq((0L, 10L), (1L, 5L)).toDF("m.id", "the w")
    val got = Packing.exclusivePrefixSum(dotted, "m.id", "the w", 2L)
      .select(col("`m.id`"), col("cum")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(0L -> 0L, 1L -> 10L))
  }

  test("top-k queries: rank window fed by the map-side partial reducer, not the raw candidate stream") {
    // q23's scoring join emits corpus×queries rows; the per-query rank
    // window may only see the ≤ k-per-partition sliver the
    // mapPartitions heap emits (Similarity.topKPerQuery). Same
    // contract for the bucketed (q24) and IVF (q41) paths.
    for (q <- Seq("q23_embed_topk", "q24_embed_ann", "q41_ivf_ann")) {
      val df = SparkEntry.queries(q)(spark, Dir)
      val nodes = allNodes(df.queryExecution.executedPlan)
      val windows = nodes.collect { case w: WindowExec => w }
      assert(windows.nonEmpty, s"$q should still rank with a window")
      windows.foreach { w =>
        val partialBelow = allNodes(w.child)
          .exists(_.getClass.getSimpleName.startsWith("MapPartitions"))
        assert(partialBelow,
          s"$q: rank window runs over the full scored candidate stream " +
            s"(map-side partial top-k missing):\n" + w.treeString)
      }
    }
  }

  test("q62: the bucket cap filters BOTH band streams below the cross-corpus join") {
    import org.apache.spark.sql.catalyst.plans.logical
    val df = SparkEntry.queries("q62_cross_corpus_capped")(spark, Dir)
    val plan = df.queryExecution.optimizedPlan
    val bucketJoin = plan.collect {
      case j: logical.Join if j.condition.exists(_.references.exists(_.name == "band_key")) => j
    }
    assert(bucketJoin.nonEmpty, "q62 lost its banded bucket join")
    // each side must carry the windowed bucket count + cap filter —
    // dropping overfull buckets BEFORE the join is the whole guard
    Seq(bucketJoin.head.left, bucketJoin.head.right).zip(Seq("left", "right")).foreach {
      case (side, name) =>
        val capWindow = side.collect { case w: logical.Window => w }
        val capFilter = side.collect {
          case f: logical.Filter if f.condition.references.exists(_.name == "__bc") => f
        }
        assert(capWindow.nonEmpty, s"q62 $name side lost its bucket-count window")
        assert(capFilter.nonEmpty, s"q62 $name side lost its cap filter")
    }
  }

  test("q63: skinny hash stream cached once and read by both branches; spine scan pruned") {
    Caches.unpersistAll(blocking = true)
    val df = SparkEntry.queries("q63_video_frame_dups")(spark, Dir)
    val planStr = df.queryExecution.executedPlan.toString
    // the (id, fhash) projection must come from the tracked cache on
    // BOTH the occurrence-count branch and the join branch — otherwise
    // every frame of every payload is decoded twice
    val cacheScans = "InMemoryTableScan".r.findAllIn(planStr).size
    assert(cacheScans >= 2,
      s"q63 decodes payloads more than once (found $cacheScans cache scans):\n" +
        planStr.take(2000))
    // the left-join spine only needs ids: the parquet scan under it must
    // prune to doc_id alone
    assert(planStr.contains("ReadSchema: struct<doc_id:bigint>"),
      "q63 spine scan reads more than doc_id")
    assert(Caches.unpersistAll(blocking = true) >= 1) // and it IS tracked
  }

  test("q40 token quantiles: every window runs over aggregated rows") {
    val df = SparkEntry.queries("q40_token_quantiles")(spark, Dir)
    val nodes = allNodes(df.queryExecution.executedPlan)
    val windows = nodes.collect { case w: WindowExec => w }
    assert(windows.nonEmpty, "q40 should still use cumulative windows")
    windows.foreach { w =>
      val aggBelow = allNodes(w.child).exists(_.isInstanceOf[BaseAggregateExec])
      assert(aggBelow,
        s"q40: window over un-aggregated corpus rows (per-language sort is back):\n" +
          w.treeString)
    }
  }
}
