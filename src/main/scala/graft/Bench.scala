package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // three iterations: r7's recorded bench landed on a noisy box and
    // the 2-sample min still carried 4-6x phantom regressions; a third
    // sample makes the min robust to a single slow execution while the
    // per-iteration times array keeps the noise itself visible
    val iterations = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup: run one cheap query so JVM/codegen/session startup cost
    // isn't attributed to whichever query happens to execute first.
    try SparkEntry.queries("q6_filtered_revenue")(spark, sfDir).count()
    catch { case _: Throwable => () }
    // Timed action: materialize EVERY output row through the unmodified
    // physical plan (queryExecution.toRdd). A plain .count() plans a
    // count-aggregate over the query, and Catalyst then prunes every
    // column the count doesn't need — for map-only queries (quality
    // scoring, fingerprints, chunking) that collapses the benchmark to
    // little more than a parquet metadata read, and even aggregations
    // skip computing the un-counted sum columns (measured 3-4x
    // under-reporting at sf0.1). toRdd.count() computes all output
    // columns exactly as a consumer writing the result would.
    //
    // min over iterations: the first execution of each query pays its
    // whole-stage-codegen compilation (~1s for the larger plans),
    // which at real scale amortizes to nothing — the steady-state
    // number is the meaningful one.
    // Environment telemetry (r16 verdict ask #1): the r16 driver run
    // read 334 s against a 232 s same-tree builder record, with
    // per-iteration stalls of 30-100 s on queries whose plans hadn't
    // changed in three rounds — and adjudicating "busy box" vs "plan
    // regression" took a whole re-run session. Per-iteration process
    // CPU seconds, GC ms, and 1-min box load make that adjudication a
    // file read: a stalled iteration shows wall >> cpu with load far
    // above this JVM's own thread count; a real regression shows cpu
    // growing with wall.
    val osBean = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def gcMs: Long = {
      val it = java.lang.management.ManagementFactory
        .getGarbageCollectorMXBeans.iterator()
      var s = 0L
      while (it.hasNext) { val t = it.next().getCollectionTime; if (t > 0) s += t }
      s
    }
    case class Iter(wall: Double, cpu: Double, gc: Long, load: Double)
    val results = SparkEntry.queries.map { case (name, fn) =>
      val iters = (1 to iterations).map { _ =>
        // drop the LSH/gram caches BEFORE each timed run: operators
        // persist skinny projections that a second iteration (or a
        // later query sharing the projection) would read back warm —
        // min-over-iterations must price the full compute every time
        graft.llm.Caches.unpersistAll(blocking = true)
        val load0 = osBean.getSystemLoadAverage
        val gc0 = gcMs
        val cpu0 = osBean.getProcessCpuTime
        val t0 = System.nanoTime()
        // a failing query must fail the BENCH, not score as the run's
        // fastest entry — swallowing into a -1 sentinel once masked
        // breakage behind a plausible-looking number
        try fn(spark, sfDir).queryExecution.toRdd.count()
        catch {
          case e: Throwable =>
            throw new RuntimeException(s"bench query $name failed", e)
        }
        Iter((System.nanoTime() - t0) / 1e9,
          (osBean.getProcessCpuTime - cpu0) / 1e9,
          gcMs - gc0, load0)
      }
      name -> iters
    }
    // locale-pinned decimal rendering: the f"" interpolator formats
    // with the JVM default locale, and a comma-decimal locale would
    // turn 4.123 into "4,123" — structurally-valid, semantically
    // garbled JSON in the committed bench record
    def dec(v: Double, places: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${places}f", Double.box(v))
    def fmtMap(f: Iter => String): String = results.map { case (k, v) =>
      s"\"" + k + "\":" + v.map(f).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v.map(_.wall).min }
      .mkString("{", ",", "}")
    // every iteration's time, not just the min: a one-off slow
    // iteration (GC pause, box noise) then shows up as [4.1, 0.4]
    // instead of masquerading as — or hiding — a plan regression
    val iters = fmtMap(i => dec(i.wall, 3))
    val cpus = fmtMap(i => dec(i.cpu, 3))
    val gcs = fmtMap(_.gc.toString)
    val loads = fmtMap(i => dec(i.load, 2))
    val total = if (results.nonEmpty) results.values.map(_.map(_.wall).min).sum
                else 0.0
    val env = s"""{"processors":${Runtime.getRuntime.availableProcessors}""" +
      s""","load1m_end":${dec(osBean.getSystemLoadAverage, 2)}""" +
      s""","jvm":"${System.getProperty("java.version")}"}"""
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"times":$iters,"cpu_sec":$cpus,"gc_ms":$gcs,"load1m":$loads,"env":$env,"sf":"$sfDir"}"""
    println(full)
    // ALSO land the complete per-query record in a committed file:
    // stdout rides the harness's bounded tail capture (2 KB), which
    // has twice manufactured phantom 7-11x regressions that had to be
    // adjudicated by hand-rerunning — cross-round per-query claims
    // must come from a file no tail can truncate
    val detailPath = sys.env.getOrElse(
      "SPARK_GRAFT_BENCH_DETAIL", "/root/repo/BENCH_DETAIL.json")
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(detailPath),
      (full + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"bench detail write failed ($detailPath): $e")
    }
    // LAST line is a compact summary: the full JSON above exceeds the
    // harness's bounded tail capture (r8 lost the total and 47 of 80
    // query times to the 2000-char window), so the headline number
    // must ride a line short enough to always survive truncation
    println(s"""{"n":${results.size},"total_min_sec":$total,"sf":"$sfDir"}""")
    spark.stop()
  }
}
