package graft

/** Collision-free internal column names for operators that add working
  * columns to caller DataFrames (as-of join tags, range-join buckets,
  * prefix-sum shards). A fixed name like `_ts` silently misbinds when
  * the caller's schema already uses it; `fresh` appends a numeric
  * suffix until the name is unused.
  */
private[graft] object Names {
  def fresh(base: String, taken: Iterable[String]): String = {
    val t = taken.toSet
    if (!t.contains(base)) base
    else Iterator.from(1).map(i => s"$base$i").find(n => !t.contains(n)).get
  }

  /** Backtick-quote a caller-supplied column name for use in parsed
    * contexts (`expr`, `col`, `withWatermark`): dotted or hyphenated
    * names otherwise parse as field access / arithmetic. */
  def quoted(name: String): String = s"`${name.replace("`", "``")}`"
}
