package graft.llm.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.llm.MinHashLSH

/** The whole shingle-base-hash traversal of [[graft.llm.MinHashLSH]]
  * as one codegen'd primitive loop: trim → whitespace-tokenize → word
  * n-grams → md5 → first-60-bits mod P, per document.
  *
  * Semantics are bit-identical to the composable SQL form
  * (`baseHashExpr(shingleExpr(tokens(text), n))`), which the DuckDB
  * oracle replays — this expression only removes the interpreted
  * higher-order lambdas and the per-shingle hex-string/conv detour
  * (md5 bytes are consumed directly: the first 15 hex chars of a
  * digest are its first 8 bytes shifted right a nibble). Contracts
  * preserved exactly:
  *  - blank/empty text → the single shingle "" (what
  *    `concat_ws(' ', array())` yields downstream of the empty-token
  *    CASE);
  *  - fewer than n tokens → one shingle of all tokens joined;
  *  - null input → null (UnaryExpression null-intolerance).
  */
case class ShingleBasesExpr(child: Expression, shingleN: Int) extends UnaryExpression {

  require(shingleN >= 1, "shingleN must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_bases requires STRING input, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      ShingleBasesExpr.compute(input.asInstanceOf[UTF8String].toString, shingleN))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.llm.expressions.ShingleBasesExpr.compute($c.toString(), $shingleN));
         |""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleBasesExpr =
    copy(child = newChild)

  override def prettyName: String = "shingle_bases"
}

object ShingleBasesExpr {

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** 60-bit base hash of one shingle string: md5 of the UTF-8 bytes,
    * first 8 digest bytes big-endian >>> 4 (== the value of the first
    * 15 hex chars), reduced mod P. */
  private def baseHash(s: String): Long = {
    val d = md5.get()
    d.reset()
    val dig = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
    (v >>> 4) % MinHashLSH.P
  }

  /** Called from both the interpreted and generated paths.
    * Trim matches Spark's `trim` exactly: only ASCII space (0x20) is
    * stripped — Java's String.trim also removes tabs/newlines, which
    * would diverge from the SQL form (a leading tab yields an empty
    * first token through split, and the oracle sees that token). */
  def compute(text: String, n: Int): Array[Long] = {
    var s0 = 0
    var e0 = text.length
    while (s0 < e0 && text.charAt(s0) == ' ') s0 += 1
    while (e0 > s0 && text.charAt(e0 - 1) == ' ') e0 -= 1
    val trimmed = text.substring(s0, e0)
    val toks: Array[String] =
      if (trimmed.isEmpty) Array.empty else trimmed.split("\\s+", -1)
    if (toks.length < n) {
      Array(baseHash(toks.mkString(" ")))
    } else {
      val out = new Array[Long](toks.length - n + 1)
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i + n <= toks.length) {
        sb.setLength(0)
        var j = i
        while (j < i + n) {
          if (j > i) sb.append(' ')
          sb.append(toks(j))
          j += 1
        }
        out(i) = baseHash(sb.toString)
        i += 1
      }
      out
    }
  }
}
