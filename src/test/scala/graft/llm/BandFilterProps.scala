package graft.llm

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.SparkTestSession

/** ScalaCheck: tokenBandFilter's distributed order-statistic
  * thresholds equal the sequential sorted-index definition for
  * arbitrary corpora and percentile bands — the contract the q74
  * oracle relies on. */
object BandFilterProps extends Properties("BandFilter") with SparkTestSession {

  private val docsGen: Gen[List[(Long, Int)]] = for {
    n <- Gen.choose(1, 40)
    // token counts 0..12, many ties — the regime where rank arithmetic
    // off-by-ones hide
    ts <- Gen.listOfN(n, Gen.choose(0, 12))
  } yield ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private val bandGen: Gen[(Int, Int)] = for {
    lo <- Gen.choose(0, 100)
    hi <- Gen.choose(lo, 100)
  } yield (lo, hi)

  property("thresholds equal the sequential sorted-rank definition") =
    forAll(docsGen, bandGen) { case (docs, (loPct, hiPct)) =>
      import spark.implicits._
      val df = docs.map { case (id, t) => (id, Seq.fill(t)("w").mkString(" ")) }
        .toDF("doc_id", "text")
      val got = TextAnalysis.tokenBandFilter(df, "doc_id", "text", loPct, hiPct)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
      // sequential definition: rank r = max(ceil(pct·N/100), 1); the
      // threshold is the r-th smallest token count (1-indexed)
      val sorted = docs.map(_._2.toLong).sorted
      val n = sorted.length
      def th(pct: Int): Long = sorted(
        (math.max((pct.toLong * n + 99) / 100, 1L) - 1).toInt min (n - 1))
      val (lo, hi) = (th(loPct), th(hiPct))
      docs.forall { case (id, t) =>
        got(id) == ((t.toLong, lo, hi, t >= lo && t <= hi))
      }
    }
}
