package graft.layout

/** Z-order (Morton) curve arithmetic — the multi-dimensional data-
  * layout key behind clustered table layouts (Delta/Iceberg
  * `OPTIMIZE ZORDER BY`): interleaving the bits of two columns makes
  * rows that are close in BOTH dimensions close on the curve, so
  * range-partitioning by z-value gives every file a tight min/max
  * envelope in every interleaved column and scan-time zone-map
  * pruning works for predicates on ANY of them — not just the leading
  * sort key, the lexicographic layout's blind spot.
  *
  * The interleave is expressed as a sum of disjoint-bit terms built
  * from floor-division and modulo only, so ONE generator serves both
  * engines (Spark `div`, DuckDB `//`) and the audit query's oracle
  * replays the exact key. Inputs must be pre-reduced to `[0, 2^bits)`
  * (the caller mods them); terms never overlap, so `+` is exact bit
  * assembly with no carries.
  */
object ZOrder {

  /** The interleaved z-value of `x` and `y` (each already in
    * `[0, 2^bits)`), as a SQL expression string: bit i of x lands at
    * position 2i, bit i of y at 2i+1. `divOp` is the engine's integer
    * floor-division operator (`div` in Spark SQL, `//` in DuckDB). */
  def zExprSql(x: String, y: String, bits: Int, divOp: String): String = {
    require(bits > 0 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).flatMap { i =>
      Seq(s"(($x $divOp ${1L << i}) % 2) * ${1L << (2 * i)}",
        s"(($y $divOp ${1L << i}) % 2) * ${1L << (2 * i + 1)}")
    }.mkString(" + ")
  }
}
