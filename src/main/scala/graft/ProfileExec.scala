package graft

/** Print the EXECUTED (post-AQE) plan of the named queries — the
  * final plan after runtime re-optimization, including AQEShuffleRead
  * coalescing and join-strategy rewrites, which `explain` before
  * execution cannot show. Measurement aid for the optimization
  * rounds; not part of the driver contract. */
object ProfileExec {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries("q6_filtered_revenue")(spark, sfDir).count()
    args.foreach { name =>
      graft.llm.Caches.unpersistAll(blocking = true)
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.queryExecution.toRdd.count()
      println(s"==== $name executed plan ====")
      println(df.queryExecution.executedPlan.toString.take(60000))
    }
    spark.stop()
  }
}
