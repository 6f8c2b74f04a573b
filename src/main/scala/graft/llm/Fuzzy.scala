package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy entity resolution: an edit-distance join in the repo's
  * candidate/verify shape. Matching a dirty name list against a
  * master list is the record-linkage step of every ingestion pipeline
  * (supplier names, place names, user-typed addresses); all-pairs
  * Levenshtein is quadratic, so candidates come from BLOCKING — and
  * the block key must be complete for the radius or the join silently
  * loses matches.
  *
  * Length is the one cheap key that is provably edit-safe: an edit
  * changes a string's length by at most 1, so `lev(a,b) ≤ k` implies
  * `|len(a) − len(b)| ≤ k`. With band width `k+1`, true pairs sit at
  * most one band apart — the left side probes `{band−1, band, band+1}`
  * (the 1-D grid probe, same pattern as [[graft.geo.GeoGrid]]'s 3×3
  * and sign-LSH's Hamming-1 multiprobe) and the right side sits at its
  * own band, so every qualifying pair meets EXACTLY once (the right
  * row has one band) — no dedup pass. The verify is the codegen'd
  * built-in `levenshtein`, behind a cheap length prefilter.
  *
  * 100 TB shape: one shuffle keyed on the band; the probe explosion
  * triples only the skinny left projection; dense bands are the skew
  * risk (length is a weak key — short names pile up), which composes
  * with the q49/q79 rank-truncation caps or a composite block key
  * upstream; the quadratic work is confined to band pairs. */
object Fuzzy {

  /** All pairs with `levenshtein(name_a, name_b) ≤ maxDist` between
    * `a` and `b` (each `(id, name)`): returns `(id_a, id_b, lev)`.
    * Null names drop out (no length → no band), the standard
    * unscorable contract. */
  def editDistanceJoin(a: DataFrame, b: DataFrame, maxDist: Int): DataFrame = {
    require(maxDist >= 0, "maxDist must be non-negative")
    val w = maxDist + 1
    val left = a.select(col("id").as("id_a"), col("name").as("name_a"))
      .filter(col("name_a").isNotNull)
      .select(col("id_a"), col("name_a"),
        explode(expr(s"transform(sequence(-1, 1), i -> length(name_a) div $w + i)"))
          .as("blk"))
    val right = b.select(col("id").as("id_b"), col("name").as("name_b"))
      .filter(col("name_b").isNotNull)
      .withColumn("blk", expr(s"length(name_b) div $w"))
    left.join(right, Seq("blk"))
      .filter(abs(length(col("name_a")) - length(col("name_b"))) <= maxDist)
      .withColumn("lev", levenshtein(col("name_a"), col("name_b")))
      .filter(col("lev") <= maxDist)
      .select(col("id_a"), col("id_b"), col("lev").cast("bigint").as("lev"))
  }
}
