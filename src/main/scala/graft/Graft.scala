package graft

import org.apache.spark.sql.SparkSession

/** Single entry point for library users: registers every SQL-callable
  * function the engine provides (geo WKB functions, contour
  * generation, LLM-pipeline hashes and similarity primitives) on the
  * session. Pure Catalyst expressions are additionally installed
  * application-wide by `spark.sql.extensions=graft.GraftExtensions`
  * without any call here; this facade adds the UDF-backed functions
  * that the extensions injector cannot carry (ScalaUDF closures).
  */
object Graft {
  def registerAll(spark: SparkSession): Unit = {
    geo.GeoFunctions.registerAll(spark)
    llm.LlmFunctions.registerAll(spark)
  }
}
