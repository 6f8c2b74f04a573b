package graft.layout

import org.apache.spark.sql.DataFrame

/** Bucketed managed-table layout — the co-located-join tool.
  *
  * A table written with `bucketBy(n, key)` is hash-partitioned into n
  * files per partition AT WRITE TIME; Spark records the bucket spec in
  * the catalog, and a join (or aggregate) keyed on the bucket column
  * reads both sides ALREADY co-partitioned — no Exchange on either
  * side of the join, at any data size. That trades one shuffle at
  * write time for zero shuffles on every subsequent join against the
  * same key — the amortization a 100 TB fact table read by dozens of
  * daily joins lives on. `sortBy` within buckets additionally enables
  * sort-merge joins without a per-task sort.
  *
  * This is the persisted-layout sibling of the in-query techniques
  * the engine already leans on (broadcast for dims, repartition-
  * before-reuse, [[ZOrder]] for range locality): bucketing is the one
  * that must be declared at WRITE time, so it lives here as a sink
  * helper. BucketingSpec pins the contract: co-bucketed join plans
  * carry NO Exchange, the same join on unbucketed copies carries two.
  */
object Bucketing {

  /** Write `df` as a bucketed (and in-bucket sorted) managed parquet
    * table. `buckets` should be sized so one bucket of the LARGER
    * table fits an executor's task comfortably (128–512 MB of rows);
    * both sides of an intended co-located join must use the SAME
    * bucket count and key. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      key: String, sortKeys: Seq[String] = Nil): Unit = {
    require(buckets > 0, "buckets must be positive")
    val sorted = if (sortKeys.isEmpty) Seq(key) else sortKeys
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(sorted.head, sorted.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }
}
