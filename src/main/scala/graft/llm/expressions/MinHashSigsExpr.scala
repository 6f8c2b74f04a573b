package graft.llm.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import graft.llm.MinHashLSH

/** All k minhash signatures of a base-hash array in ONE traversal:
  * `sig_j = min over v of (v·a_j + b_j) mod P` with the LCG constants
  * from [[MinHashLSH.seedParams]].
  *
  * The higher-order-function form (`array_min(transform(...))` × k)
  * walks the array k times through interpreted lambdas; this
  * expression is a codegen'd primitive loop with k running minima —
  * the minhash inner loop is the LSH pipeline's hot path at corpus
  * scale. Null elements are skipped (array_min semantics); an empty
  * or all-null array yields null.
  */
case class MinHashSigsExpr(child: Expression, numHashes: Int) extends UnaryExpression {

  require(numHashes >= 1 && numHashes <= 64, "numHashes must be in [1, 64]")

  private val params: Seq[(Long, Long)] = (0 until numHashes).map(MinHashLSH.seedParams)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs requires ARRAY<BIGINT> input, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        val v = arr.getLong(i)
        var j = 0
        while (j < numHashes) {
          val (a, b) = params(j)
          val h = (v * a + b) % MinHashLSH.P
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    if (!any) null else new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = MinHashLSH.P
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val h = ctx.freshName("h")
      val any = ctx.freshName("any")
      val mins = ctx.freshName("mins")
      val updates = params.zipWithIndex.map { case ((a, b), j) =>
        s"$h = ($v * ${a}L + ${b}L) % ${p}L; if ($h < $mins[$j]) $mins[$j] = $h;"
      }.mkString("\n")
      s"""
         |int $n = $c.numElements();
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |boolean $any = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($c.isNullAt($i)) continue;
         |  $any = true;
         |  long $v = $c.getLong($i);
         |  long $h;
         |  $updates
         |}
         |if (!$any) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigsExpr =
    copy(child = newChild)

  override def prettyName: String = "minhash_sigs"
}
