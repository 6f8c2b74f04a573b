package graft

import org.apache.spark.sql.SparkSession

/** One-call registration of every engine SQL function — the engine's
  * `register_all_udfs` (reference `udfs/udf_tools.py:261-272`,
  * `udf_conversions.py:81-91`): geometry functions, contour
  * generation, and the LLM-pipeline functions. Native Catalyst
  * expressions are additionally installed app-wide by
  * [[GraftExtensions]]; this call makes the UDF-backed surface
  * available on a specific session.
  */
object Functions {
  def registerAll(spark: SparkSession): Unit = {
    geo.GeoFunctions.registerAll(spark)
    llm.LlmFunctions.registerAll(spark)
  }
}
