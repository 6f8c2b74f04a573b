package graft
object BenchSub {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    // measurement-only conf overrides, e.g.
    // GRAFT_BENCH_CONF="spark.sql.adaptive.enabled=false;k2=v2"
    sys.env.get("GRAFT_BENCH_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
      })
    SparkEntry.queries("q6_filtered_revenue")(spark, sfDir).count()
    for (name <- args) {
      val times = (1 to 6).map { _ =>
        graft.llm.Caches.unpersistAll(blocking = true)
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"BENCHSUB $name%-28s min=${times.min}%.2f times=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
