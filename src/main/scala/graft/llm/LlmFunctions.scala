package graft.llm

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.llm.expressions.DotFpExpr

/** SQL registration surface for the LLM-pipeline functions (same
  * pattern as `graft.geo.GeoFunctions`). */
object LlmFunctions {

  val DotFp = "dot_fp"

  def registerAll(spark: SparkSession): Unit = {
    registerDotFp(spark)
    SimHash.register(spark)
    Fingerprint.register(spark)
  }

  /** `dot_fp(a, b)` as a native codegen expression. */
  def registerDotFp(spark: SparkSession): Unit = {
    val info = new ExpressionInfo(classOf[DotFpExpr].getName, DotFp)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(DotFp),
      info,
      (children: Seq[Expression]) => {
        require(children.size == 2, s"$DotFp takes exactly 2 arguments")
        DotFpExpr(children.head, children(1))
      })
  }
}
