package graft.llm

import java.security.MessageDigest

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.llm.expressions.ShingleBasesExpr

/** ScalaCheck: the optimized digest-byte path of ShingleBasesExpr
  * equals a naive independent implementation of the SQL contract —
  * space-only trim, regex split, n-gram join, md5 hex, first 15 hex
  * chars parsed as an integer, mod P. */
object ShingleBasesProps extends Properties("ShingleBases") {

  private def naive(text: String, n: Int): Seq[Long] = {
    val trimmed = text.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
    val toks: Seq[String] =
      if (trimmed.isEmpty) Seq.empty else trimmed.split("\\s+", -1).toSeq
    val shingles =
      if (toks.length < n) Seq(toks.mkString(" "))
      else toks.sliding(n).map(_.mkString(" ")).toSeq
    shingles.map { s =>
      val hex = MessageDigest.getInstance("MD5")
        .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map(b => f"$b%02x").mkString
      (BigInt(hex.take(15), 16) % MinHashLSH.P).toLong
    }
  }

  private val genText: Gen[String] = {
    val token = Gen.oneOf(Gen.alphaNumStr.map(_.take(6)),
      Gen.oneOf("æøå", "日本", "x", "", "a-b", " nb"))
    val sep = Gen.oneOf(" ", "  ", "\t", "\n", " \t ", "")
    for {
      k <- Gen.chooseNum(0, 12)
      toks <- Gen.listOfN(k, token)
      seps <- Gen.listOfN(k, sep)
      lead <- Gen.oneOf("", " ", "  ", "\t")
      trail <- Gen.oneOf("", " ", "\n")
    } yield lead + toks.zip(seps).map { case (t, s) => t + s }.mkString + trail
  }

  property("digest-byte fast path == naive hex-string implementation") =
    forAll(genText, Gen.chooseNum(1, 4)) { (text, n) =>
      ShingleBasesExpr.compute(text, n).toSeq == naive(text, n)
    }
}
