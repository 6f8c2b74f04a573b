package graft

/** Plan audit over the WHOLE query surface: prints the physical plan
  * of every `SparkEntry.queries` entry so shuffle/pushdown/broadcast
  * drift is reviewable per round. The audit list is DERIVED from the
  * query map — a new query is audited the moment it registers, and
  * `SparkEntrySpec` fails the build if an exclusion names a query
  * that does not exist or carries no justification, so the list can
  * no longer silently lag the surface (it sat at 108/174 for two
  * rounds when it was hand-maintained). */
object ExplainAudit {

  /** Queries intentionally NOT plan-audited, each with a one-line
    * justification. Empty on purpose: every current query constructs
    * its DataFrame (iterative operators run their bounded training
    * jobs) in seconds at sf0.01, so nothing earns an exemption. Add
    * an entry ONLY with a reason the spec can show a reviewer. */
  val excluded: Map[String, String] = Map.empty

  /** Everything registered minus the justified exclusions, sorted so
    * audit output diffs cleanly between rounds. */
  def auditList: Seq[String] =
    (SparkEntry.queries.keySet -- excluded.keySet).toSeq.sorted

  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val only = if (args.length > 1) args(1).split(",").toSet else Set.empty[String]
    val list = if (only.nonEmpty) auditList.filter(only) else auditList
    for (q <- list) {
      println(s"===== $q =====")
      val df = SparkEntry.queries(q)(spark, dir)
      println(df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode).take(3000))
    }
    println(s"AUDITED ${list.size} of ${SparkEntry.queries.size} queries " +
      s"(${excluded.size} excluded)")
    spark.stop()
  }
}
