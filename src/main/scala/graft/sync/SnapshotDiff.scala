package graft.sync

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot change detection — the dataflow half of the reference's
  * PostGIS merge path: `PostgresSyncManager`'s MERGE statement
  * (reference `sync_df_to_pgdb.py`) applies delete/update/insert arms
  * against the staged frame, and THIS operator is what computes those
  * arms as data — the CDC diff every incremental sync, audit log, and
  * reconciliation report starts from.
  *
  * One FULL OUTER join on the business key classifies every key
  * present in either snapshot: `insert` (new only), `delete` (old
  * only), `update` (both, any compared column differs under null-safe
  * equality), `unchanged`. Compared columns are the non-key columns
  * PRESENT IN BOTH frames — schema drift on either side narrows the
  * comparison rather than failing it (additive-migration tolerance;
  * the caller can pass `compareCols` to pin the set).
  *
  * 100 TB shape: exactly one shuffle, keyed on the business key — the
  * minimal movement any diff needs; bucketing both snapshots by the
  * key makes it co-located (`ScaleTechniquesSpec`'s contract). Row
  * payloads cross the exchange once; the verdict is a row-local
  * null-safe conjunction. */
object SnapshotDiff {

  /** `(keyCols..., change)` for every key in either snapshot. */
  def diff(oldDf: DataFrame, newDf: DataFrame, keyCols: Seq[String],
      compareCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    val q = graft.Names.quoted _
    val cmp =
      if (compareCols.nonEmpty) compareCols
      else oldDf.columns.filterNot(keyCols.contains)
        .filter(newDf.columns.contains).toSeq
    val o = oldDf.select((keyCols ++ cmp).map(c => col(q(c))): _*)
      .withColumn("__in_old", lit(true))
    val n = newDf.select(keyCols.map(c => col(q(c))) ++
        cmp.map(c => col(q(c)).as(s"__new_$c")): _*)
      .withColumn("__in_new", lit(true))
    val same = cmp.map(c => col(q(c)) <=> col(s"__new_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    o.join(n, keyCols, "full_outer")
      .select(keyCols.map(c => col(q(c))) :+
        when(col("__in_old").isNull, lit("insert"))
          .when(col("__in_new").isNull, lit("delete"))
          .when(same, lit("unchanged"))
          .otherwise(lit("update")).as("change"): _*)
  }
}
