package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Partial-run hardening (r18 verdict lead item): the r18 driver run was
  * killed at a ~60-min cap and yielded `CORRECTNESS_r18.json = {}` even
  * though most per-query parquet was already on disk, because
  * oracle_sql.json was written only AFTER the query loop. Three changes
  * make a killed run yield a partial board instead of an empty one:
  *   1. oracle_sql.json is written BEFORE the loop — it is pure metadata
  *      (no SparkSession needed), so it must never be hostage to it.
  *   2. queries run cheap-first, ordered by the committed BENCH_DETAIL
  *      times when available — a truncated run then completes the MOST
  *      queries possible before the cap.
  *   3. a wall-clock deadline measured from JVM start (covers sbt
  *      startup + compile when run un-forked) stops the loop gracefully
  *      with margin for spark.stop(), instead of being SIGKILLed
  *      mid-parquet-write.
  */
object Verify {
  /** Ascending-cost query order: committed bench times as the prior,
    * unknown queries last in name order. Pure so VerifySpec can pin it. */
  def cheapFirst(names: Seq[String], cost: Map[String, Double]): Seq[String] =
    names.sortBy(n => (cost.getOrElse(n, Double.MaxValue), n))

  /** Minimal extractor for `"queries":{"qN":1.23,...}` from the bench
    * detail JSON — no JSON library in the classpath, and the file is
    * machine-written by Bench itself so the shape is stable. Any parse
    * trouble degrades to an empty prior (name-order run), never a crash. */
  def benchPrior(path: String): Map[String, Double] =
    try {
      val txt = Files.readString(Paths.get(path))
      val m = """"queries"\s*:\s*\{([^}]*)\}""".r.findFirstMatchIn(txt)
      m.map { g =>
        """"([^"]+)"\s*:\s*([0-9.Ee+-]+)""".r.findAllMatchIn(g.group(1))
          .flatMap(p => p.group(2).toDoubleOption.map(p.group(1) -> _))
          .toMap
      }.getOrElse(Map.empty)
    } catch { case _: Throwable => Map.empty }

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg: comma-separated query names — builder-side
    // spot-checks of new operators without replaying the whole suite.
    // The driver always passes two args, so its full run is unchanged.
    val only: Set[String] =
      if (args.length > 2) args(2).split(',').toSet else Set.empty
    // A typo'd name must fail loudly: silently selecting nothing would
    // write no parquet + an empty oracle_sql.json and exit 0 — a
    // spot-check that looks green while checking nothing.
    val unknown = only -- SparkEntry.queries.keySet
    require(unknown.isEmpty,
      s"unknown query name(s): ${unknown.toSeq.sorted.mkString(", ")}")
    val selected =
      if (only.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => only(n) }
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val dumped =
      if (only.isEmpty) SparkEntry.oracleSql
      else SparkEntry.oracleSql.filter { case (n, _) => only(n) }
    val json = dumped
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Deadline from JVM start: when Verify runs inside the sbt JVM the
    // start time covers sbt launch + compile, which is exactly the share
    // of the driver's cap this process cannot see any other way. 0
    // disables. Default 3000 s leaves ~10 min of a 60-min cap for
    // session teardown and the driver's own bookkeeping.
    val deadlineSec =
      sys.env.getOrElse("SPARK_GRAFT_VERIFY_DEADLINE_SEC", "3000").toLong
    val jvmStartMs =
      java.lang.management.ManagementFactory.getRuntimeMXBean.getStartTime
    def expired: Boolean = deadlineSec > 0 &&
      (System.currentTimeMillis() - jvmStartMs) / 1000L >= deadlineSec
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    val order = cheapFirst(selected.keys.toSeq,
      benchPrior(sys.env.getOrElse(
        "SPARK_GRAFT_BENCH_DETAIL", "/root/repo/BENCH_DETAIL.json")))
    var skipped = 0
    order.foreach { name =>
      if (expired) skipped += 1
      else try selected(name)(spark, sfDir).coalesce(1).write
        .mode("overwrite").parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    if (skipped > 0) System.err.println(
      s"[verify] deadline ${deadlineSec}s tripped: $skipped of " +
        s"${order.size} queries skipped (cheap-first order ran the rest)")
    spark.stop()
  }
}
