package graft

import org.apache.spark.sql.SparkSession

/** Shared local session for specs — one per JVM (sbt forks one test
  * JVM), built through `Sessions.builder` so tests run with exactly the
  * semantics of the Verify/Bench entry points.
  */
trait SparkTestSession {
  lazy val spark: SparkSession = SparkTestSession.session
}

object SparkTestSession {
  lazy val session: SparkSession = {
    val s = Sessions.builder("local[4]", 4)
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

/** Shared plan-shape helper: flatten an executed plan, recursing into
  * AQE wrappers so asserts see the real operators. */
object PlanNodes {
  import org.apache.spark.sql.execution.SparkPlan
  import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
  def all(p: SparkPlan): Seq[SparkPlan] =
    p.collect { case n => n }.flatMap {
      case a: AdaptiveSparkPlanExec => all(a.executedPlan)
      case n => Seq(n)
    }
}
