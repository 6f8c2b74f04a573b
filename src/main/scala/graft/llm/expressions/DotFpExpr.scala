package graft.llm.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native fixed-point dot product: Σ floor(a[i]·b[i]·10⁶) as BIGINT.
  *
  * Same arithmetic as the higher-order-function formulation in
  * `graft.llm.Similarity.dotFpExpr` (per-element fixed point → exact
  * associative integer sum), but `zip_with`/`aggregate` evaluate
  * interpreted lambdas with per-element boxing; this expression stays
  * inside whole-stage codegen as a primitive loop — the hot path of
  * brute-force and ANN vector search at corpus scale.
  *
  * Null contract: null if either array is null, lengths differ, or
  * any touched element is null (mirrors what the HOF form yields).
  * Accepts array<float> and array<double> operands in any mix.
  */
case class DotFpExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"dot_fp requires ARRAY<FLOAT|DOUBLE> operands, got ${l.sql} and ${r.sql}")
  }

  private def elemIsDouble(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]
    val bb = b.asInstanceOf[ArrayData]
    val n = aa.numElements()
    if (n != bb.numElements()) return null
    val aIsD = elemIsDouble(left)
    val bIsD = elemIsDouble(right)
    var acc = 0L
    var i = 0
    while (i < n) {
      if (aa.isNullAt(i) || bb.isNullAt(i)) return null
      val x = if (aIsD) aa.getDouble(i) else aa.getFloat(i).toDouble
      val y = if (bIsD) bb.getDouble(i) else bb.getFloat(i).toDouble
      acc += math.floor(x * y * 1000000.0).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGet = if (elemIsDouble(left)) "getDouble" else "getFloat"
    val bGet = if (elemIsDouble(right)) "getDouble" else "getFloat"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val n = ctx.freshName("n")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (long) Math.floor(
         |      ((double) $a.$aGet($i)) * ((double) $b.$bGet($i)) * 1000000.0);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
         |""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotFpExpr = copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_fp"
}
