package graft.llm

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.SparkTestSession

/** ScalaCheck: the mojibake repair chain is the exact inverse of the
  * double-encoding corruption on detector-clean text (no 'Ã' present
  * before corruption — the q239 card's precondition), and the
  * lead-byte detector fires on a corrupted doc iff the original
  * contained a pair character at all. */
object MojibakeProps extends Properties("Mojibake") with SparkTestSession {

  // detector-clean alphabet: ASCII plus the well-formed pair
  // characters, never the artifact lead 'Ã'
  private val cleanChar: Gen[Char] = Gen.frequency(
    8 -> Gen.alphaNumChar,
    2 -> Gen.oneOf(' ', '.', ',', '!', '?'),
    2 -> Gen.oneOf('é', 'ü'))

  private val cleanGen: Gen[String] = for {
    n <- Gen.choose(0, 80)
    cs <- Gen.listOfN(n, cleanChar)
  } yield cs.mkString

  property("repair ∘ corrupt = id; detector fires iff a pair char present") =
    forAll(Gen.listOf(cleanGen)) { texts =>
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      texts.isEmpty || {
        val got = texts.toDF("t")
          .select(col("t"),
            TextAnalysis.mojibakeArtifactCount(col("t")).as("art0"),
            TextAnalysis.mojibakeCorrupt(col("t")).as("cur"))
          .select(col("t"), col("art0"),
            TextAnalysis.mojibakeArtifactCount(col("cur")).as("art"),
            TextAnalysis.mojibakeRepair(col("cur")).as("rt"))
          .collect()
        got.forall { r =>
          val (t, art0, art, rt) =
            (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3))
          val nPair = t.count(c => c == 'é' || c == 'ü')
          art0 == 0L && rt == t && art == nPair && (art > 0L) == (nPair > 0)
        }
      }
    }
}
