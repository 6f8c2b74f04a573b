package graft

import scala.collection.mutable

/** Per-query job/stage/task telemetry — the measurement harness for the
  * optimization rounds (guide §1: decide whether wall goes to scheduling
  * or compute before touching a plan). For each query named in args:
  * one untimed warm run is skipped — the single run reports
  *   jobs   = driver job submissions (collects, AQE stage jobs, actions)
  *   stages = completed stages
  *   tasks  = tasks launched
  *   taskSec= summed executor task time (the real compute)
  *   wall   = end-to-end seconds
  * A query whose wall >> taskSec/32 and jobs is large is
  * scheduling-bound; shrink its sequential structure, not its kernels.
  */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries("q6_filtered_revenue")(spark, sfDir).count()
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    val verbose = sys.env.get("GRAFT_PROFILE_JOBS_VERBOSE").contains("1")
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          if (verbose) jobStart.put(j.jobId, (j.time,
            Option(j.properties).flatMap(p =>
              Option(p.getProperty("callSite.short"))).getOrElse("?")))
        }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          if (verbose) {
            val st = jobStart.remove(j.jobId)
            if (st != null) println(
              f"  JOB ${j.jobId}%4d ${(j.time - st._1) / 1000.0}%7.2fs  ${st._2}")
          }
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet()
          tasks.addAndGet(s.stageInfo.numTasks.toLong)
          if (verbose) {
            val i = s.stageInfo
            val sumMs = Option(i.taskMetrics)
              .map(_.executorRunTime).getOrElse(-1L)
            if (sumMs >= 150L) println(
              f"  STAGE ${i.stageId}%4d tasks=${i.numTasks}%4d " +
                f"runMs=$sumMs%6d  ${i.name.take(90)}")
          }
        }
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskInfo != null)
            taskMs.addAndGet(t.taskInfo.duration)
      })
    val names = if (args.nonEmpty) args.toSeq else Seq("q3_nation_revenue")
    println(f"${"query"}%-32s ${"jobs"}%5s ${"stages"}%7s ${"tasks"}%6s ${"taskSec"}%8s ${"wall"}%6s")
    names.foreach { name =>
      graft.llm.Caches.unpersistAll(blocking = true)
      jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener bus is async; give it a beat to drain
      Thread.sleep(300)
      println(f"$name%-32s ${jobs.get}%5d ${stages.get}%7d ${tasks.get}%6d ${taskMs.get / 1000.0}%8.1f $wall%6.2f")
    }
    spark.stop()
  }
}
