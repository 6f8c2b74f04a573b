package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution has heavy hitters.
  *
  * AQE's skew-join split (on by default in `graft.Sessions`) handles
  * sort-merge skew at runtime; salting is the complementary static
  * technique for the cases AQE can't fix — e.g. a broadcast-ineligible
  * dimension joined on a key where one value carries a large fraction
  * of the fact table, which no partition split can rebalance because
  * the hot key hashes to one reducer.
  *
  * `saltedEquiJoin` splits each hot key into `saltFactor` synthetic
  * sub-keys: the big side gets a random-but-deterministic salt
  * (hash-derived, so re-runs are stable), the small side is exploded
  * `saltFactor`× so every sub-key finds its match. Correctness is
  * unchanged for any equi-join; the small side grows by the factor,
  * so pick it close to (hot-key share × shuffle partitions).
  */
object Skew {

  /** Deterministic salt in [0, saltFactor) for the big side — derived
    * from a stable row hash, not rand(), so retries and speculative
    * tasks agree. */
  private def salt(cols: Seq[Column], saltFactor: Int): Column =
    pmod(xxhash64(cols: _*), lit(saltFactor)).cast("int")

  /** Equi-join `big ⋈ small` on `keys`, salted `saltFactor` ways.
    * `bigSaltSource` columns feed the salt hash (defaults to all of
    * the big side's columns via xxhash64 of the keys + a uniform
    * spread column if provided). */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      saltFactor: Int, joinType: String = "inner",
      spreadCols: Seq[String] = Nil): DataFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    // right/full joins would emit each unmatched SMALL row saltFactor
    // times (it exists once per salt); only big-side-preserving joins
    // are salt-correct
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti", "cross").contains(
      joinType.toLowerCase(java.util.Locale.ROOT).replace(" ", "_")),
      s"saltedEquiJoin does not support join type '$joinType': " +
        "unmatched small-side rows would be duplicated per salt")
    val spread: Seq[Column] =
      if (spreadCols.nonEmpty) spreadCols.map(big(_))
      else big.columns.map(big(_)).toSeq // whole row → uniform spread
    val bigSalted = big.withColumn("__salt", salt(spread, saltFactor))
    val smallExploded = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    bigSalted.join(smallExploded, keys :+ "__salt", joinType).drop("__salt")
  }
}
