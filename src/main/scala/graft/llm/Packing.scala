package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exclusive prefix sum — the primitive behind sequence
  * packing (assign documents to fixed token budgets in id order).
  *
  * The naive formulation is a single global ordering window, which
  * forces the whole corpus through ONE task's sort — correct at test
  * scale, the definitive scale-killer at 100 TB. This is the standard
  * two-level form instead:
  *
  *   1. shard each row by `id div shardSize` (deterministic, order-
  *      preserving: every id in shard k sorts before every id in
  *      shard k+1);
  *   2. per-shard exclusive cumulative sum — a window PARTITIONED by
  *      shard, so each task sorts only its shard;
  *   3. per-shard totals → running offsets. The offsets window is
  *      global but runs over the AGGREGATED shard totals (one row per
  *      shard — bounded by id-range/shardSize, never by corpus size);
  *   4. broadcast-join the offsets back: global prefix = offset +
  *      local prefix.
  *
  * The result is bit-identical to the global window (integer sums are
  * associative) with the corpus-sized sort split across shards. The
  * per-shard totals branch reuses the same scan subtree; Spark's
  * exchange reuse keeps it to one read in the common case.
  */
object Packing {

  /** The length-sorted-batching decision card: padding waste of
    * fixed-size batches under (a) hash-order batching — the shuffled
    * data-loader default — vs (b) length-descending batching within
    * the same shards. Each batch pads every member to its own max
    * length, so waste_ppm = padded slots / total slots; sorting by
    * length groups like-sized sequences and is the standard fix this
    * card prices rather than asserts.
    *
    * Scale shape: a data-parallel loader batches PER SHARD, so both
    * schemes rank inside hash shards (`hash32(key) mod nShards` —
    * shardPlan's decorrelation), never a global window; everything
    * after the two per-shard rank windows is batch-keyed aggregation.
    * The skinny (hash, key, len) projection is persisted for its two
    * scheme consumers. Null keys are excluded (no deterministic
    * position). Output: one row per scheme — (scheme, n_batches,
    * total_tokens, padded_tokens, waste_ppm). */
  def batchWasteCard(df: DataFrame, keyCol: String, lenCol: String,
      nShards: Int, batchSize: Int): DataFrame = {
    require(nShards > 0 && batchSize > 0, "shards and batch size positive")
    val qk = graft.Names.quoted(keyCol)
    val ql = graft.Names.quoted(lenCol)
    val base = Caches.persistTracked(
      df.filter(col(qk).isNotNull)
        .select(Sampling.hash32(keyCol).as("__h"), col(qk).as("__k"),
          col(ql).cast("bigint").as("__len"))
        .withColumn("__shard", col("__h") % nShards))
    def scheme(name: String, order: Seq[Column]): DataFrame =
      base
        .withColumn("__rn", row_number().over(
          Window.partitionBy(col("__shard")).orderBy(order: _*)))
        .withColumn("__batch", expr(s"(__rn - 1) div $batchSize"))
        .groupBy(col("__shard"), col("__batch"))
        .agg(count(lit(1)).as("__b"), max(col("__len")).as("__mx"),
          sum(col("__len")).cast("bigint").as("__t"))
        .agg(count(lit(1)).cast("bigint").as("n_batches"),
          sum(col("__t")).cast("bigint").as("total_tokens"),
          sum(col("__b") * col("__mx") - col("__t")).cast("bigint")
            .as("padded_tokens"))
        .select(lit(name).as("scheme"), col("n_batches"), col("total_tokens"),
          col("padded_tokens"),
          expr("cast(cast(padded_tokens as decimal(38,0)) * 1000000 " +
            "div greatest(total_tokens + padded_tokens, 1L) as bigint)")
            .as("waste_ppm"))
    scheme("hash_order", Seq(col("__h").asc, col("__k").asc))
      .unionByName(
        scheme("length_sorted", Seq(col("__len").desc, col("__k").asc)))
  }

  /** Adds `outCol` = exclusive prefix sum of `weightCol` in `idCol`
    * order. `idCol` must be non-negative integral and unique; weights
    * must be NON-NEGATIVE integral (shard totals are recovered as the
    * max inclusive local prefix — sizes and token counts qualify).
    * `shardSize` is the id span per shard — size it so a shard's rows
    * fit one task comfortably. */
  def exclusivePrefixSum(df: DataFrame, idCol: String, weightCol: String,
      shardSize: Long, outCol: String = "cum"): DataFrame = {
    require(shardSize > 0, "shardSize must be positive")
    require(!df.columns.contains(outCol),
      s"output column '$outCol' already exists — pass a different outCol")
    // column parameters are literal names: quote them everywhere they
    // pass through a parser (expr AND col), so dotted/odd names behave
    def q(name: String) = s"`${name.replace("`", "``")}`"
    val taken = df.columns.toSeq :+ outCol
    val shardC = graft.Names.fresh("_shard", taken)
    val lcumC = graft.Names.fresh("_lcum", taken)
    val stotC = graft.Names.fresh("_stot", taken)
    val offC = graft.Names.fresh("_off", taken)

    // the explicit not-null filter matches the one the optimizer
    // infers on the join side, keeping both branches' shuffle subtrees
    // canonically identical (a prerequisite for stage reuse below)
    val sharded = df.withColumn(shardC,
        expr(s"cast(${q(idCol)} as bigint) div ${shardSize}L"))
      .filter(col(shardC).isNotNull)
    val wLocal = Window.partitionBy(col(shardC)).orderBy(col(q(idCol)))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = sharded.withColumn(lcumC,
      sum(col(q(weightCol))).over(wLocal) - col(q(weightCol)))

    // Shard totals are derived FROM the windowed frame (max inclusive
    // local prefix per shard), not from a separate aggregation of the
    // raw input: that keeps this branch's subtree identical to the
    // main branch's, so Spark's exchange reuse evaluates the upstream
    // (scan + weight computation + shard shuffle) ONCE instead of
    // re-scanning the corpus. The groupBy runs on the exchange's own
    // partitioning key (no extra shuffle), and the only global window
    // touches one row per shard — bounded by id-range/shardSize.
    val wOff = Window.orderBy(col(shardC))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = local.groupBy(col(shardC))
      .agg(max(col(lcumC) + col(q(weightCol))).as(stotC))
      .withColumn(offC, sum(col(stotC)).over(wOff) - col(stotC))
      .select(col(shardC), col(offC))

    local.join(broadcast(offsets), shardC)
      .withColumn(outCol, col(lcumC) + col(offC))
      .drop(shardC, lcumC, offC)
  }
}
