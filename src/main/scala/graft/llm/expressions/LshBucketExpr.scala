package graft.llm.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native sign-random-projection LSH bucket: the 8-bit sign pattern of
  * the fixed-point projections onto 8 deterministic hyperplanes —
  * exactly `Similarity.bucketExpr`'s composition of 8 `dot_fp` calls
  * against plane literals, folded into ONE codegen'd loop.
  *
  * The composed form walks the embedding 8 times through 8 separate
  * `dot_fp` evaluations, each against a materialized `array<double>`
  * literal; this expression carries the weight matrix (from
  * `Similarity.planeWeights`, the single source of truth shared with
  * the DuckDB oracles) as a plan reference and accumulates all 8
  * projections in a single pass over the array. Bucketing dominates
  * the ANN/near-dup query scans (q24/q29), so the 8× traversal cut
  * lands directly on the hot path.
  *
  * Semantics (bit-compatible with the composed form): a null array, a
  * length other than the declared `dim`, or any null element makes
  * every per-plane dot NULL in the composed form, so every
  * `when(dot > 0, …)` falls to its 0 branch — the bucket is 0, never
  * null.
  */
case class LshBucketExpr(child: Expression, dim: Int) extends UnaryExpression {

  @transient private lazy val planes: Array[Array[Double]] =
    graft.llm.Similarity.planeWeights(dim).map(_.map(_.toDouble).toArray).toArray

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_bucket requires ARRAY<FLOAT|DOUBLE>, got ${other.sql}")
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
    var bucket = 0L
    var p = 0
    while (p < planes.length) {
      val w = planes(p)
      var acc = 0L
      i = 0
      while (i < n) {
        val x = if (isD) arr.getDouble(i) else arr.getFloat(i).toDouble
        acc += math.floor(x * w(i) * 1000000.0).toLong
        i += 1
      }
      if (acc > 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsDouble) "getDouble" else "getFloat"
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    val c = child.genCode(ctx)
    val arr = c.value
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val p = ctx.freshName("p")
    val acc = ctx.freshName("acc")
    val ok = ctx.freshName("ok")
    val w = ctx.freshName("w")
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
        |    for (int $p = 0; $p < ${planes.length}; $p++) {
        |      double[] $w = $planesRef[$p];
        |      long $acc = 0L;
        |      for (int $i = 0; $i < $n; $i++) {
        |        $acc += (long) Math.floor(
        |          ((double) $arr.$get($i)) * $w[$i] * 1000000.0);
        |      }
        |      if ($acc > 0) ${ev.value} |= (1L << $p);
        |    }
        |  }
        |}
        |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): LshBucketExpr =
    copy(child = newChild)
}
