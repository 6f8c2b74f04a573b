package graft.llm

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.SparkTestSession

/** Randomized brute-force oracles for the round-12 curation cards —
  * the KnnProps treatment applied to [[Dedup.snmPairs]],
  * [[TextAnalysis.tokenDivergenceFp]] and
  * [[Sampling.temperatureMixture]]: small random corpora, the
  * expected answer recomputed in plain Scala BigInt arithmetic, and
  * the degenerate shapes included on purpose (duplicate texts that
  * tie on the sort key, single-token vocabularies, empty and
  * whitespace-only docs, strata whose token mass collides). Fewer
  * cases than a pure-JVM property — each run is a distributed job. */
object CurationCardsProps extends Properties("CurationCards") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withMaxDiscardRatio(10)

  private lazy val spark = SparkTestSession.session

  private val genWord = Gen.oneOf("aa", "ab", "ba", "bb", "cc")
  private val genText: Gen[String] = Gen.frequency(
    8 -> Gen.chooseNum(1, 6).flatMap(n =>
      Gen.listOfN(n, genWord).map(_.mkString(" "))),
    1 -> Gen.const(""),
    1 -> Gen.const("   "))

  private val genDocs: Gen[Seq[(Long, String)]] = for {
    n <- Gen.chooseNum(2, 18)
    texts <- Gen.listOfN(n, genText)
  } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private def norm(t: String): String =
    t.toLowerCase.replaceAll("\\s+", " ").trim

  property("snmPairs equals the per-block sort-window brute force") = {
    val blockLen = 2
    val w = 2
    forAll(genDocs) { docs =>
      import spark.implicits._
      val got = Dedup.snmPairs(docs.toDF("doc_id", "text"), "doc_id", "text",
          blockPrefixLen = blockLen, windowSize = w)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getBoolean(5))).toSet
      val expected = docs.map { case (id, t) => (id, norm(t)) }
        .groupBy { case (_, k) => k.take(blockLen) }
        .flatMap { case (block, rows) =>
          val sorted = rows.sortBy { case (id, k) => (k, id) }
          for {
            i <- sorted.indices
            d <- 1 to w
            if i + d < sorted.length
          } yield {
            val (ia, ka) = sorted(i)
            val (ib, kb) = sorted(i + d)
            (block, math.min(ia, ib), math.max(ia, ib), d.toLong,
              math.abs(ka.length - kb.length).toLong, ka == kb)
          }
        }.toSet
      got == expected
    }
  }

  property("tokenDivergenceFp equals the BigInt brute force and is a TVD") = {
    val genGrouped: Gen[Seq[(String, String)]] = for {
      docs <- genDocs
      groups <- Gen.listOfN(docs.length, Gen.oneOf("g1", "g2", "g3"))
    } yield groups.zip(docs.map(_._2))
    forAll(genGrouped) { rows =>
      import spark.implicits._
      val got = TextAnalysis.tokenDivergenceFp(
          rows.toDF("g", "text"), "g", "text")
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val toks = rows.flatMap { case (g, t) =>
        norm(t).split(" ").filter(_.nonEmpty).map(g -> _)
      }
      val n = BigInt(toks.length)
      val ct = toks.groupBy(_._2).map { case (w0, xs) => w0 -> BigInt(xs.length) }
      val expected = toks.groupBy(_._1).map { case (g, xs) =>
        val rs = BigInt(xs.length)
        val cg = xs.groupBy(_._2).map { case (w0, ys) => w0 -> BigInt(ys.length) }
        val num = ct.map { case (w0, c) =>
          (cg.getOrElse(w0, BigInt(0)) * n - rs * c).abs
        }.sum
        g -> (xs.length.toLong, (num * 1000000 / (2 * rs * n)).toLong)
      }
      got == expected && got.values.forall { case (_, t) =>
        t >= 0L && t <= 1000000L
      }
    }
  }

  property("temperatureMixture equals the BigInt brute force; shares never overshoot") = {
    val genStrata: Gen[Seq[(String, Long)]] = for {
      n <- Gen.chooseNum(1, 12)
      rows <- Gen.listOfN(n, Gen.zip(Gen.oneOf("a", "b", "c", "d"),
        Gen.chooseNum(0L, 100000L)))
    } yield rows
    forAll(genStrata) { rows =>
      import spark.implicits._
      val got = Sampling.temperatureMixture(
          rows.toDF("src", "n_tok"), "src", "n_tok")
        .collect()
        .map(r => (r.getString(0),
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
        .toMap
      val agg = rows.groupBy(_._1).map { case (s, xs) =>
        s -> (xs.length.toLong, xs.map(_._2).sum)
      }
      val wfp = agg.map { case (s, (_, tok)) =>
        s -> math.floor(math.sqrt(tok.toDouble) * 1e6).toLong
      }
      val tw = wfp.values.sum
      val tn = agg.values.map(_._2).sum
      val expected = agg.map { case (s, (nd, tok)) =>
        val ppm = (BigInt(wfp(s)) * 1000000 / BigInt(tw).max(1)).toLong
        val ep = (BigInt(tn) * ppm / BigInt(tok).max(1)).toLong
        s -> (nd, tok, wfp(s), ppm, ep)
      }
      got == expected &&
        got.values.map(_._4).sum <= 1000000L
    }
  }
}
