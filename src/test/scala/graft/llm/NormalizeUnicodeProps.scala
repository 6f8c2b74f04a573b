package graft.llm

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.SparkTestSession

/** ScalaCheck: the native `normalize_unicode` expression equals
  * java.text.Normalizer for every form on arbitrary strings — run
  * THROUGH a DataFrame so the generated (codegen) path is what's
  * tested — plus the planted contracts the q274 card and the NFKC
  * width-folding story rely on. All non-ASCII is spelled in \\u
  * escapes so no tool can silently re-compose a fixture. */
object NormalizeUnicodeProps extends Properties("NormalizeUnicode")
    with SparkTestSession {

  // strings biased toward the hard cases: combining marks, precomposed
  // accents, full-width forms, compatibility chars, plain ASCII
  private val charGen: Gen[String] = Gen.frequency(
    4 -> Gen.alphaNumChar.map(_.toString),
    1 -> Gen.const(" "),
    2 -> Gen.oneOf(
      "é", "é",   // é composed / decomposed
      "ü", "ü",   // ü composed / decomposed
      "Å", "Å",   // Å composed / decomposed
      "ß", "ñ", "ç"),
    1 -> Gen.oneOf("Ａ", "ｂ", "０"), // full-width A b 0
    1 -> Gen.oneOf("ﬁ", "①", "½")) // fi-ligature ① ½
  private val textGen: Gen[String] =
    Gen.listOf(charGen).map(_.mkString).map(_.take(80))

  private def viaSpark(form: String, inputs: Seq[String]): Seq[String] = {
    import spark.implicits._
    inputs.toDF("t")
      // a shuffle keeps ConvertToLocalRelation from pre-evaluating the
      // expression out of the plan — the codegen path must run
      .repartition(2)
      .select(call_function("normalize_unicode", col("t"), lit(form)))
      .collect().map(_.getString(0)).toSeq
  }

  property("every form equals java.text.Normalizer through codegen") =
    forAll(Gen.listOfN(8, textGen)) { texts =>
      graft.llm.expressions.NormalizeUnicodeExpr.Forms.forall {
        case (name, form) =>
          val got = viaSpark(name, texts).sorted
          val want = texts.map(java.text.Normalizer.normalize(_, form)).sorted
          got == want
      }
    }

  property("NFC composes the q274 plants; NFKC additionally folds width") =
    forAll(Gen.const(())) { _ =>
      val decomposed = "café"
      val fullWidth = "ＡＢＣ"
      viaSpark("NFC", Seq(decomposed, fullWidth)) ==
        Seq("café", fullWidth) &&
        viaSpark("NFKC", Seq(decomposed, fullWidth)) ==
          Seq("café", "ABC")
    }

  property("unicodeFingerprint: canonically-equivalent spellings collide, " +
      "distinct content tracks normalized equality") =
    forAll(textGen, textGen) { (a, b) =>
      import spark.implicits._
      val fps = Seq(
        ("nfd", a + "é"), ("nfc", a + "é"),
        ("other", a + b + "x"))
        .toDF("k", "t").repartition(2)
        .select(col("k"), Dedup.unicodeFingerprint(col("t")).as("fp"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      def norm(s: String) = java.text.Normalizer
        .normalize(s, java.text.Normalizer.Form.NFC).toLowerCase
        .replaceAll("\\s+", " ").trim
      val equivalentCollide = fps("nfd") == fps("nfc")
      val thirdTracks = (fps("other") == fps("nfc")) ==
        (norm(a + b + "x") == norm(a + "é"))
      equivalentCollide && thirdTracks
    }
}
