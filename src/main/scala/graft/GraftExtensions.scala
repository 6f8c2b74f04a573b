package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.geo.expressions.WkbGeomTypeExpr
import graft.llm.expressions.{DotFpExpr, InterCountExpr, LshBucketExpr, MinHashSigsExpr, ShingleBasesExpr, SignWordExpr}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.IntegerType

/** Spark extensions entry point: installs the engine's native Catalyst
  * expressions into every session of the application via
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * so SQL users get `get_wkb_geom_type` / `dot_fp` without calling a
  * registration API — the production packaging for cluster-wide
  * deploys. Also installs the engine's optimizer rules
  * ([[graft.plans.IntersectCountRewrite]]: the naive
  * `size(array_intersect(...))` spelling compiles to the native
  * two-pointer `inter_count` when provably safe). UDF-backed
  * functions (linearization, contours, simhash,
  * fingerprints) still attach per session via
  * `GeoFunctions.registerAll` / `LlmFunctions.registerAll`, since
  * ScalaUDF closures cannot be installed through the extensions
  * injector.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.IntersectCountRewrite)
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
    ext.injectFunction((
      FunctionIdentifier(graft.llm.LlmFunctions.MinHashSigs),
      new ExpressionInfo(classOf[MinHashSigsExpr].getName,
        graft.llm.LlmFunctions.MinHashSigs),
      (children: Seq[Expression]) => {
        require(children.size == 2, "minhash_sigs takes exactly 2 arguments")
        MinHashSigsExpr(children.head, intLiteral(children(1), "minhash_sigs"))
      }))
    ext.injectFunction((
      FunctionIdentifier(graft.llm.LlmFunctions.ShingleBases),
      new ExpressionInfo(classOf[ShingleBasesExpr].getName,
        graft.llm.LlmFunctions.ShingleBases),
      (children: Seq[Expression]) => {
        require(children.size == 2, "shingle_bases takes exactly 2 arguments")
        ShingleBasesExpr(children.head, intLiteral(children(1), "shingle_bases"))
      }))
    ext.injectFunction((
      FunctionIdentifier(graft.llm.LlmFunctions.InterCount),
      new ExpressionInfo(classOf[InterCountExpr].getName,
        graft.llm.LlmFunctions.InterCount),
      (children: Seq[Expression]) => {
        require(children.size == 2, "inter_count takes exactly 2 arguments")
        InterCountExpr(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier(graft.llm.LlmFunctions.LshBucket),
      new ExpressionInfo(classOf[LshBucketExpr].getName,
        graft.llm.LlmFunctions.LshBucket),
      (children: Seq[Expression]) => {
        require(children.size == 2, "lsh_bucket takes exactly 2 arguments")
        LshBucketExpr(children.head, intLiteral(children(1), "lsh_bucket"))
      }))
    ext.injectFunction((
      FunctionIdentifier(graft.llm.LlmFunctions.SignWord),
      new ExpressionInfo(classOf[SignWordExpr].getName,
        graft.llm.LlmFunctions.SignWord),
      (children: Seq[Expression]) => {
        require(children.size == 2, "sign_word takes exactly 2 arguments")
        SignWordExpr(children.head, intLiteral(children(1), "sign_word"))
      }))
    ext.injectFunction((
      FunctionIdentifier(graft.llm.LlmFunctions.NormalizeUnicode),
      new ExpressionInfo(
        classOf[graft.llm.expressions.NormalizeUnicodeExpr].getName,
        graft.llm.LlmFunctions.NormalizeUnicode),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "normalize_unicode takes exactly 2 arguments")
        val form = children(1) match {
          case Literal(v, _) if v != null => v.toString
          case other => throw new IllegalArgumentException(
            s"normalize_unicode form must be a string literal, got $other")
        }
        graft.llm.expressions.NormalizeUnicodeExpr(children.head, form)
      }))
  }

  private def intLiteral(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: expected an INT literal argument, got $other")
  }
}
