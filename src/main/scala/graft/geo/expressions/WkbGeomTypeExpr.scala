package graft.geo.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{call_udf, column}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for WKB geometry-type extraction.
  *
  * Upgrade path over a plain `ScalaUDF` (SURVEY.md §4): `doGenCode`
  * emits a direct static call so the expression stays inside
  * whole-stage codegen with no closure dispatch or null-boxing. The
  * scalar itself only touches the 5-byte header, so at 100 TB the cost
  * is the parquet scan, not this expression.
  *
  * Accepts BinaryType (WKB bytes) or StringType (hex) children —
  * mirroring the reference UDF's polymorphic input handling
  * (`udf_tools.py:55-71`). Never returns null: invalid inputs map to
  * `Invalid (…)` diagnostics, and a null child maps to
  * `Invalid (null input)`, so `nullable = false`.
  */
case class WkbGeomTypeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"get_wkb_geom_type requires BINARY or STRING input, got ${other.sql}")
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    UTF8String.fromString(evalAny(v))
  }

  private def evalAny(v: Any): String = v match {
    case null              => "Invalid (null input)"
    case b: Array[Byte]    => graft.geo.GeomType.ofBytes(b)
    case s: UTF8String     => graft.geo.GeomType.ofHex(s.toString)
    case other             => s"Invalid (unsupported type: ${other.getClass.getSimpleName})"
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val childGen = child.genCode(ctx)
    val fn = child.dataType match {
      case BinaryType => s"graft.geo.GeomType.ofBytes(${childGen.value})"
      case _          => s"graft.geo.GeomType.ofHex(${childGen.value}.toString())"
    }
    val resultCode =
      code"""
         |${childGen.code}
         |UTF8String ${ev.value} = ${childGen.isNull}
         |  ? UTF8String.fromString("Invalid (null input)")
         |  : UTF8String.fromString($fn);
         |""".stripMargin
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): WkbGeomTypeExpr =
    copy(child = newChild)

  override def prettyName: String = "get_wkb_geom_type"
}

object WkbGeomTypeExpr {
  /** Column-level API: `geomType(col("wkb"))`. */
  def geomType(c: Column): Column = {
    // Column.expr is internal in Spark 4; route through the SQL
    // function registry name instead (registered by GeoFunctions).
    call_udf("get_wkb_geom_type", c)
  }
  def geomTypeOf(colName: String): Column = geomType(column(colName))
}
