package graft.llm.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode normalization (java.text.Normalizer forms NFC /
  * NFD / NFKC / NFKD) as a codegen'd scalar — Spark ships no
  * normalization builtin, and the dedup key that catches "café"
  * (composed U+00E9) vs "café" (e + combining U+0301) needs one on
  * the row-local hot path next to `lower`/`md5`. NFKC additionally
  * folds compatibility variants (full-width ＡＢＣ → ABC), the width
  * normalization a multilingual crawl needs before fingerprinting.
  *
  * Already-normalized input short-circuits (`Normalizer.isNormalized`
  * is a cheap scan) — on the ASCII bulk of a real corpus the
  * expression is a no-op pass-through of the existing UTF8String.
  *
  * The DuckDB oracle replays the NFC form via `nfc_normalize()`
  * (both implement the same Unicode spec); NFKC has no DuckDB
  * counterpart and is spec-certified instead
  * ([[graft.llm.NormalizeUnicodeProps]] pins every form against
  * java.text.Normalizer directly). */
case class NormalizeUnicodeExpr(child: Expression, form: String)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"normalize_unicode requires STRING, got ${child.dataType.sql}")
    else if (!NormalizeUnicodeExpr.Forms.contains(form))
      TypeCheckResult.TypeCheckFailure(
        s"unknown normalization form '$form' " +
          s"(expected one of ${NormalizeUnicodeExpr.Forms.keys.mkString(", ")})")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(v: Any): Any =
    NormalizeUnicodeExpr.normalize(v.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""${ev.value} = graft.llm.expressions.NormalizeUnicodeExpr
         |  .normalize($c, "$form");""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : NormalizeUnicodeExpr = copy(child = newChild)

  override def prettyName: String = "normalize_unicode"
}

object NormalizeUnicodeExpr {
  val Forms: Map[String, java.text.Normalizer.Form] = Map(
    "NFC" -> java.text.Normalizer.Form.NFC,
    "NFD" -> java.text.Normalizer.Form.NFD,
    "NFKC" -> java.text.Normalizer.Form.NFKC,
    "NFKD" -> java.text.Normalizer.Form.NFKD)

  /** Shared by the interpreted and generated paths. */
  def normalize(s: UTF8String, form: String): UTF8String = {
    val f = Forms(form)
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
  }
}
