package graft.governance

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-dynamic column profiling — the audit card a warehouse runs
  * before trusting a table (the reference's governance layer checks
  * table/column METADATA, `governance/checks/column.py:10-36`; this is
  * the data-side complement: per-column null mass, exact distinct
  * cardinality, and value range).
  *
  * One declarative aggregation over one scan produces every column's
  * stats; the wide single-row result is then unpivoted with `stack`
  * into the `(column_name, n_nulls, n_distinct, min_s, max_s)` card.
  * Catalyst plans the multi-DISTINCT aggregate as a single scan +
  * Expand (one duplicate per distinct column), so an N-column profile
  * costs one pass over the data times N+1 row expansion — never N
  * scans.
  *
  * 100 TB note: exact DISTINCT is the audit-grade path and inherently
  * shuffles per column; for routine monitoring at full scale swap the
  * distinct aggregates for the mergeable HLL registers
  * ([[graft.llm.Sketches.hllRegisters]]) and keep this exact form for
  * sampled or per-partition audits.
  *
  * Determinism contract: min/max aggregate on the NATIVE value (or its
  * fixed-point image for floats — floor is monotone, so
  * `min(floor(x·100)) = floor(min(x)·100)`) and only the final scalar
  * is rendered to string, with timestamps formatted to the second
  * (`yyyy-MM-dd HH:mm:ss`, chronological as a string) so the rendering
  * is engine-portable. Float distinct counts are over the fixed-point
  * image, matching the repo-wide float contract.
  */
object Profile {

  /** Fixed-point scale for float/double columns (cents). */
  val FloatScale = 100L

  private def aggKey(f: StructField): Column = f.dataType match {
    case FloatType | DoubleType =>
      floor(col(quoted(f.name)) * FloatScale).cast("bigint")
    case _ => col(quoted(f.name))
  }

  private def render(f: StructField, c: Column): Column = f.dataType match {
    case DateType => date_format(c, "yyyy-MM-dd")
    case TimestampType | TimestampNTZType =>
      date_format(c, "yyyy-MM-dd HH:mm:ss")
    case StringType => c
    case _ => c.cast("string")
  }

  private def quoted(n: String): String = s"`${n.replace("`", "``")}`"

  /** The profile card: one row per column of `df` —
    * `(column_name, n_nulls, n_distinct, min_s, max_s)`. */
  def columnProfile(df: DataFrame): DataFrame = {
    val fields = df.schema.fields
    require(fields.nonEmpty, "cannot profile a zero-column frame")
    val aggs = fields.toSeq.flatMap { f =>
      val k = aggKey(f)
      Seq(
        sum(when(col(quoted(f.name)).isNull, 1L).otherwise(0L))
          .as(s"${f.name}__nulls"),
        countDistinct(k).as(s"${f.name}__distinct"),
        min(k).as(s"${f.name}__min"),
        max(k).as(s"${f.name}__max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = fields.toSeq.map { f =>
      struct(
        lit(f.name).as("column_name"),
        coalesce(col(quoted(s"${f.name}__nulls")), lit(0L)).as("n_nulls"),
        col(quoted(s"${f.name}__distinct")).as("n_distinct"),
        render(f, col(quoted(s"${f.name}__min"))).as("min_s"),
        render(f, col(quoted(s"${f.name}__max"))).as("max_s"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }
}
