package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for corpus curation.
  *
  * Scale design: one hash-shuffle on the dedup key, then a window over
  * each key's partition — no driver state, no all-pairs comparison.
  * The shuffle necessarily moves whichever columns the caller wants to
  * survive; when only ids are needed, project to (id, fingerprint)
  * BEFORE deduplicating (as `q17_dedup_norm` does) so megabyte
  * payloads never cross the wire. The join key itself is always a
  * short value (text equality dedups hash the text for partitioning;
  * fingerprint dedups ship 32-byte digests).
  */
object Dedup {

  /** Whitespace-collapse + lowercase + trim — the normalization used
    * before fingerprinting so trivially-reformatted copies collide. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** 128-bit content fingerprint of the normalized text. */
  def fingerprint(text: Column): Column = md5(normalizeText(text).cast("binary"))

  /** Exact dedup: one surviving row per distinct value of `keys`, the
    * survivor being the row with the smallest `tieBreak`. Returns the
    * full original row set, filtered — implemented as a row_number
    * window over the key so arbitrary payload columns survive without
    * being shuffled twice. */
  def exact(df: DataFrame, keys: Seq[String], tieBreak: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tieBreak))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Near-dup removal by normalized fingerprint: groups rows whose
    * normalized text is identical. */
  def byFingerprint(df: DataFrame, textCol: String, tieBreak: String): DataFrame =
    exact(df.withColumn("__fp", fingerprint(col(textCol))), Seq("__fp"), tieBreak)
      .drop("__fp")
}
