package graft.llm.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native binary-embedding packer: bit `i` of one 64-bit word set iff
  * `embedding[i] > 0` — the 32× compression behind q206's Hamming
  * search, folded into a single codegen'd loop over the array.
  *
  * The composed higher-order-function spelling
  * (`aggregate(sequence(...))`, kept as
  * `Similarity.signWordComposed` for the bit-compatibility spec)
  * allocates a lambda frame per element; packing runs on every
  * corpus vector at scan time, so the flat loop lands on the hot
  * path the same way `lsh_bucket` does for bucketing.
  *
  * Semantics: bit `dim-1 = 63` intentionally lands on the Long sign
  * bit (Java `<<` wrap) — XOR/popcount distance is sign-agnostic,
  * and the DuckDB oracle replays the same two's-complement value. A
  * null array, a length other than `dim`, or any null element packs
  * to 0L, never null (the `lsh_bucket` malformed-input contract). */
case class SignWordExpr(child: Expression, dim: Int) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sign_word requires ARRAY<FLOAT|DOUBLE>, got ${other.sql}")
  }

  private def elemIsDouble: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return 0L
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n != dim) return 0L
    var i = 0
    while (i < n) { if (arr.isNullAt(i)) return 0L; i += 1 }
    val isD = elemIsDouble
    var word = 0L
    i = 0
    while (i < n) {
      val x = if (isD) arr.getDouble(i) else arr.getFloat(i).toDouble
      if (x > 0.0) word |= (1L << i)
      i += 1
    }
    word
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsDouble) "getDouble" else "getFloat"
    val c = child.genCode(ctx)
    val arr = c.value
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val ok = ctx.freshName("ok")
    ev.copy(
      isNull = FalseLiteral,
      code = code"""
        |${c.code}
        |long ${ev.value} = 0L;
        |if (!${c.isNull}) {
        |  int $n = $arr.numElements();
        |  boolean $ok = ($n == $dim);
        |  for (int $j = 0; $ok && $j < $n; $j++) {
        |    if ($arr.isNullAt($j)) $ok = false;
        |  }
        |  if ($ok) {
        |    for (int $i = 0; $i < $n; $i++) {
        |      if (((double) $arr.$get($i)) > 0.0) ${ev.value} |= (1L << $i);
        |    }
        |  }
        |}
        |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): SignWordExpr =
    copy(child = newChild)
}
