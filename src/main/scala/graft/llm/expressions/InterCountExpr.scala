package graft.llm.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Intersection cardinality of two SORTED-ascending distinct BIGINT
  * arrays, as a two-pointer merge walk — O(|a|+|b|) with zero
  * allocation, replacing `size(array_intersect(a, b))`, which builds a
  * hash set per row. The Jaccard-verify stage of the LSH pipelines
  * evaluates this once per candidate pair, which makes it the hot
  * loop after candidate generation.
  *
  * Contract: both inputs ascending and duplicate-free (what
  * `sort_array(array_distinct(...))` produces). Unsorted input gives
  * an undercount, not an error — keep the sort at the set-build site.
  */
case class InterCountExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"inter_count requires two ARRAY<BIGINT> inputs, got ${l.sql}, ${r.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    InterCountExpr.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"${ev.value} = graft.llm.expressions.InterCountExpr.count($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InterCountExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "inter_count"
}

object InterCountExpr {
  /** Two-pointer merge over sorted ArrayData (called from both the
    * interpreted and generated paths). Null elements cannot occur in
    * the producing pipeline (shingle_bases emits containsNull=false),
    * but the app-wide optimizer rule can rewrite USER SQL over
    * nullable-element arrays — and Spark's `array_intersect` counts a
    * null shared by both sides exactly once. `sort_array(asc)` places
    * nulls first and `array_distinct` keeps at most one, so a shared
    * null is a shared head: count it like any other match. */
  def count(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      if (a.isNullAt(i) && b.isNullAt(j)) { c += 1; i += 1; j += 1 }
      else if (a.isNullAt(i)) { i += 1 }
      else if (b.isNullAt(j)) { j += 1 }
      else {
        val va = a.getLong(i)
        val vb = b.getLong(j)
        if (va == vb) { c += 1; i += 1; j += 1 }
        else if (va < vb) i += 1
        else j += 1
      }
    }
    c
  }
}
