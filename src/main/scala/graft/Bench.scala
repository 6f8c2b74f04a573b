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
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to iterations).map { _ =>
        // drop the LSH/gram caches BEFORE each timed run: operators
        // persist skinny projections that a second iteration (or a
        // later query sharing the projection) would read back warm —
        // min-over-iterations must price the full compute every time
        graft.llm.Caches.unpersistAll(blocking = true)
        val t0 = System.nanoTime()
        // a failing query must fail the BENCH, not score as the run's
        // fastest entry — swallowing into a -1 sentinel once masked
        // breakage behind a plausible-looking number
        try fn(spark, sfDir).queryExecution.toRdd.count()
        catch {
          case e: Throwable =>
            throw new RuntimeException(s"bench query $name failed", e)
        }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v.min }
      .mkString("{", ",", "}")
    // every iteration's time, not just the min: a one-off slow
    // iteration (GC pause, box noise) then shows up as [4.1, 0.4]
    // instead of masquerading as — or hiding — a plan regression
    val iters = results.map { case (k, v) =>
      s"\"" + k + "\":" + v.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.map(_.min).sum else 0.0
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"times":$iters,"sf":"$sfDir"}"""
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
