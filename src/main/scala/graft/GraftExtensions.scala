package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.geo.expressions.WkbGeomTypeExpr
import graft.llm.expressions.DotFpExpr

/** Spark extensions entry point: installs the engine's native Catalyst
  * expressions into every session of the application via
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * so SQL users get `get_wkb_geom_type` / `dot_fp` without calling a
  * registration API — the production packaging for cluster-wide
  * deploys. UDF-backed functions (linearization, contours, simhash,
  * fingerprints) still attach per session via
  * `GeoFunctions.registerAll` / `LlmFunctions.registerAll`, since
  * ScalaUDF closures cannot be installed through the extensions
  * injector.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier(graft.geo.GeoFunctions.GetWkbGeomType),
      new ExpressionInfo(classOf[WkbGeomTypeExpr].getName,
        graft.geo.GeoFunctions.GetWkbGeomType),
      (children: Seq[Expression]) => {
        require(children.size == 1, "get_wkb_geom_type takes exactly 1 argument")
        WkbGeomTypeExpr(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier(graft.llm.LlmFunctions.DotFp),
      new ExpressionInfo(classOf[DotFpExpr].getName, graft.llm.LlmFunctions.DotFp),
      (children: Seq[Expression]) => {
        require(children.size == 2, "dot_fp takes exactly 2 arguments")
        DotFpExpr(children.head, children(1))
      }))
  }
}
