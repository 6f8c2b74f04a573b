package graft.sync

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) maintenance: apply a fresh
  * snapshot to a VERSIONED dimension table — the standard answer when
  * a sync target needs history, not just the latest state (the
  * reference's platform syncs snapshots; warehouses downstream keep
  * versions). Rows carry `valid_from`/`valid_to` (null = current);
  * applying a snapshot at `batchTs`:
  *
  *   - `delete`/`update` keys: the current version CLOSES
  *     (`valid_to = batchTs`);
  *   - `update`/`insert` keys: the snapshot row OPENS
  *     (`valid_from = batchTs`, `valid_to = null`);
  *   - `unchanged` keys and already-closed history pass through.
  *
  * Change classification is [[SnapshotDiff.diff]] — the same
  * null-safe column comparison, so the two operators cannot drift.
  *
  * 100 TB shape: every join is keyed on the business key (bucketing
  * co-locates all of them); history rows never join anything — they
  * union straight through; the result is exactly one version-open and
  * one version-close arm per changed key, no window over history. */
object Scd2 {

  /** Apply `snapshot` to the versioned `dim` at `batchTs`. `dim` =
    * `(keyCols..., dataCols..., valid_from, valid_to)`; `snapshot` =
    * `(keyCols..., dataCols...)`. Returns the new versioned table. */
  def applySnapshot(dim: DataFrame, snapshot: DataFrame, keyCols: Seq[String],
      batchTs: Long): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    require(dim.columns.contains("valid_from") && dim.columns.contains("valid_to"),
      "dim must carry valid_from/valid_to")
    val q = graft.Names.quoted _
    val history = dim.filter(col("valid_to").isNotNull)
    val current = dim.filter(col("valid_to").isNull)
    val changes = SnapshotDiff.diff(
      current.drop("valid_from", "valid_to"), snapshot, keyCols)
    val closed = current.join(
        changes.filter(col("change").isin("delete", "update"))
          .select(keyCols.map(c => col(q(c))): _*),
        keyCols)
      .withColumn("valid_to", lit(batchTs))
    val kept = current.join(
      changes.filter(col("change") === "unchanged")
        .select(keyCols.map(c => col(q(c))): _*),
      keyCols)
    val opened = snapshot.join(
        changes.filter(col("change").isin("insert", "update"))
          .select(keyCols.map(c => col(q(c))): _*),
        keyCols)
      .withColumn("valid_from", lit(batchTs))
      .withColumn("valid_to", lit(null).cast("bigint"))
    history.unionByName(closed).unionByName(kept)
      .unionByName(opened.select(history.columns.map(c => col(q(c))): _*))
  }
}
