package graft

/** Split each query's wall into CONSTRUCT (DataFrame building),
  * PLAN (analysis + optimization + physical planning, forced via
  * executedPlan), and RUN (toRdd.count) — the driver-side planning
  * share is invisible in task metrics but is paid on every bench
  * iteration because the query function builds a fresh frame each
  * time. Measurement aid for the optimization rounds. */
object ProfilePlan {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries("q6_filtered_revenue")(spark, sfDir).count()
    println(f"${"query"}%-32s ${"cons"}%6s ${"plan"}%6s ${"run"}%6s ${"total"}%6s")
    args.foreach { name =>
      graft.llm.Caches.unpersistAll(blocking = true)
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // forces analysis/opt/planning
      val t2 = System.nanoTime()
      df.queryExecution.toRdd.count()
      val t3 = System.nanoTime()
      println(f"$name%-32s ${(t1 - t0) / 1e9}%6.2f ${(t2 - t1) / 1e9}%6.2f " +
        f"${(t3 - t2) / 1e9}%6.2f ${(t3 - t0) / 1e9}%6.2f")
    }
    spark.stop()
  }
}
