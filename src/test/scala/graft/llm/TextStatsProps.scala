package graft.llm

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.SparkTestSession

/** ScalaCheck for the session's row-local text statistics: the
  * sentence splitter and the char-collision fold, each pinned against
  * an independent plain-Scala reference over ARBITRARY generated texts
  * (punctuation runs, leading/trailing terminators, whitespace
  * clumps, empties — the shapes fixed fixtures under-sample). */
object TextStatsProps extends Properties("TextStats")
    with SparkTestSession {

  private val textGen: Gen[String] = {
    val piece = Gen.frequency(
      6 -> Gen.oneOf("cat", "dog", "runs", "the", "a", "Zz", "word"),
      2 -> Gen.oneOf(".", "!", "?", "...", "?!"),
      2 -> Gen.oneOf(" ", "  "))
    for {
      n <- Gen.choose(0, 40)
      ps <- Gen.listOfN(n, piece)
    } yield ps.mkString(" ")
  }

  private def refSentences(t: String): Seq[Seq[String]] =
    t.split("[.!?]+", -1).toSeq.map(_.trim).filter(_.nonEmpty)
      .map(_.split("\\s+").toSeq)

  property("sentenceStats matches the reference splitter") =
    forAll(Gen.listOfN(5, textGen)) { texts =>
      import spark.implicits._
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = TextAnalysis.sentenceStats(df, "doc_id", "text").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))).toMap
      texts.zipWithIndex.forall { case (t, i) =>
        val ss = refSentences(t)
        val toks = ss.map(_.length.toLong)
        val want = (ss.length.toLong, toks.sum,
          if (ss.isEmpty) 0L else toks.sum * 100 / ss.length,
          if (ss.isEmpty) 0L else toks.max)
        got(i.toLong) == want
      }
    }

  private val charTextGen: Gen[String] = for {
    n <- Gen.choose(0, 60)
    cs <- Gen.listOfN(n, Gen.oneOf("abcdeé .!?中".toSeq))
  } yield cs.mkString

  property("charCollisionFp matches the count model on arbitrary chars") =
    forAll(Gen.listOfN(6, charTextGen)) { texts =>
      import spark.implicits._
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = df.withColumn("cs", TextAnalysis.sortedChars(col("text")))
        .select(col("doc_id"), TextAnalysis.charCollisionFp("cs").as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      texts.zipWithIndex.forall { case (t, i) =>
        val n = t.length.toLong
        val want =
          if (n < 2) 0L
          else {
            val coll = t.groupBy(identity).values
              .map(g => g.length.toLong * (g.length - 1)).sum
            (BigInt(1000000) * BigInt(coll) / BigInt(n * (n - 1))).toLong
          }
        got(i.toLong) == want
      }
    }
}
