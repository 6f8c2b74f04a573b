package graft.llm.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native content-defined-chunking cut detector: the 1-based byte end
  * offsets where a document's w-byte Rabin rolling hash divides the
  * CDC divisor ([[graft.llm.Fingerprint.cdcCutEnds]] — the q234–q236
  * chunk-boundary contract).
  *
  * Why native instead of the historical Scala UDF: the UDF converts
  * each `UTF8String` to a `java.lang.String` and re-encodes it to
  * UTF-8 before hashing — two full copies of every document on the
  * hot chunking path — and wraps the result through the UDF encoder.
  * This expression hands the codegen'd scan's UTF-8 bytes straight to
  * the rolling-hash kernel and returns unsafe ArrayData, staying
  * inside whole-stage codegen. Bit-compatibility with the Scala
  * function is pinned in FingerprintSpec, and the q234–q236 oracles
  * replay the identical cut predicate in SQL.
  *
  * Null input packs to an EMPTY array, never null (the historical
  * `cdc_cuts` UDF contract — callers concat the document end, so an
  * empty cut list means one whole-document chunk). */
case class CdcCutsExpr(child: Expression,
    divisor: Long = graft.llm.Fingerprint.CdcDivisor) extends UnaryExpression {

  require(divisor > 0, "cdc_cuts divisor must be positive")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc_cuts requires STRING, got ${other.sql}")
  }

  override def eval(input: InternalRow): Any =
    graft.llm.Fingerprint.cdcCutsArrayData(
      child.eval(input).asInstanceOf[UTF8String], divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      isNull = FalseLiteral,
      code = code"""
        |${c.code}
        |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        |  graft.llm.Fingerprint.cdcCutsArrayData(
        |    ${c.isNull} ? null : ${c.value}, ${divisor}L);
        |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): CdcCutsExpr =
    copy(child = newChild)
}
