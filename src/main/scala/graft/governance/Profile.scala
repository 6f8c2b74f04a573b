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
  * Shape: one scan UNPIVOTS each row into `(col_id, value)` entries
  * (an explode over a per-row struct array — Catalyst's Expand by
  * another name), then TWO hash aggregations produce the card:
  * `(col_id, value) → count` collapses the stream to per-column
  * distinct values with their multiplicities, and the per-column
  * rollup over that bounded frame derives null mass (the null value's
  * collapsed count), distinct cardinality (a plain count), and
  * min/max. This deliberately avoids `N × countDistinct(col)` in one
  * aggregate: Spark plans that rewrite as a SortAggregate over the
  * whole expanded stream in a SINGLE partition when any min/max
  * buffer is var-length (strings), which benchmarked 7× slower than
  * this formulation at sf0.1. Here every corpus-sized stage is a
  * partial-aggregated HashAggregate; the only sort-based aggregation
  * left runs over already-distinct values, partitioned by column.
  *
  * 100 TB note: exact DISTINCT inherently shuffles the value stream;
  * for routine monitoring at full scale swap stage one for the
  * mergeable HLL registers ([[graft.llm.Sketches.hllRegisters]]) and
  * keep this exact form for sampled or per-partition audits.
  *
  * Determinism contract: values aggregate NATIVELY — integrals and
  * temporals as bigint (micros / days), floats through the monotone
  * fixed-point image `floor(x·100)` (so `min(image) = image(min)`),
  * strings as themselves — and only the final per-column scalar is
  * rendered to string (timestamps to the second, chronological as a
  * string), so rendering can never reorder numerics and the card is
  * engine-portable.
  */
object Profile {

  /** Fixed-point scale for float/double columns (cents). */
  val FloatScale = 100L

  /** The bigint image a non-string column aggregates under — null
    * iff the value is null (for the types our tables carry). */
  private def numImage(f: StructField, c: Column): Option[Column] =
    f.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        Some(c.cast("bigint"))
      case FloatType | DoubleType =>
        Some(floor(c * FloatScale).cast("bigint"))
      case TimestampType => Some(unix_micros(c))
      case TimestampNTZType => Some(unix_micros(c.cast("timestamp")))
      case DateType => Some(unix_date(c).cast("bigint"))
      case BooleanType => Some(c.cast("int").cast("bigint"))
      case _ => None // profiles through the string side
    }

  /** Render a final bigint-image scalar back to the card's portable
    * string form. */
  private def renderNum(f: StructField, c: Column): Column = f.dataType match {
    case TimestampType | TimestampNTZType =>
      date_format(timestamp_micros(c), "yyyy-MM-dd HH:mm:ss")
    case DateType => date_format(date_from_unix_date(c.cast("int")), "yyyy-MM-dd")
    case BooleanType => when(c === 1L, "true").when(c === 0L, "false")
    case _ => c.cast("string")
  }

  private def quoted(n: String): String = s"`${n.replace("`", "``")}`"

  /** The profile card: one row per column of `df` —
    * `(column_name, n_nulls, n_distinct, min_s, max_s)`. */
  def columnProfile(df: DataFrame): DataFrame = {
    val fields = df.schema.fields
    require(fields.nonEmpty, "cannot profile a zero-column frame")
    val entries = fields.toSeq.zipWithIndex.map { case (f, i) =>
      val c = col(quoted(f.name))
      val (vn, vs) = numImage(f, c) match {
        case Some(n) => (n, lit(null).cast("string"))
        case None    => (lit(null).cast("bigint"), c.cast("string"))
      }
      struct(lit(i).as("cid"), vn.as("vn"), vs.as("vs"))
    }
    val unpivoted = df
      .select(explode(array(entries: _*)).as("e"))
      .select(col("e.cid").as("cid"), col("e.vn").as("vn"), col("e.vs").as("vs"))
    // corpus-sized stage: distinct values per column, with counts —
    // nulls collapse to one (cid, null, null) row carrying the null mass
    val values = unpivoted.groupBy(col("cid"), col("vn"), col("vs"))
      .agg(count(lit(1)).as("cnt"))
    // bounded stage: the rollup runs over distinct values only
    val isNull = col("vn").isNull && col("vs").isNull
    val rolled = values.groupBy(col("cid"))
      .agg(sum(when(isNull, col("cnt")).otherwise(0L)).as("n_nulls"),
        count(when(!isNull, lit(1))).as("n_distinct"),
        min(col("vn")).as("min_vn"), max(col("vn")).as("max_vn"),
        min(col("vs")).as("min_vs"), max(col("vs")).as("max_vs"))
    // per-column dispatch on the 1-row-per-column rollup: unmatched
    // whens yield null, so coalesce picks the single matching arm
    def pick(from: StructField => Column): Column =
      coalesce(fields.toSeq.zipWithIndex
        .map { case (f, i) => when(col("cid") === i, from(f)) }: _*)
    def stringSide(f: StructField): Boolean =
      numImage(f, col(quoted(f.name))).isEmpty
    rolled.select(
      pick(f => lit(f.name)).as("column_name"),
      col("n_nulls"), col("n_distinct"),
      pick(f => if (stringSide(f)) col("min_vs")
        else renderNum(f, col("min_vn"))).as("min_s"),
      pick(f => if (stringSide(f)) col("max_vs")
        else renderNum(f, col("max_vn"))).as("max_s"))
  }
}
