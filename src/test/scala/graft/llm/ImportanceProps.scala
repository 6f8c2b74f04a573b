package graft.llm

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.SparkTestSession

/** ScalaCheck for [[Importance]]: the rational weight/score arithmetic
  * against an independent BigInt model on ARBITRARY corpora and target
  * subsets, and the serve-path equivalence (token-level
  * [[Importance.scoreArrivals]] ≡ count-level [[Importance.docScores]]
  * whenever every scored bucket is raw-known — which scoring the
  * training corpus itself guarantees). */
object ImportanceProps extends Properties("Importance")
    with SparkTestSession {

  private val B = 512
  private val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta")

  private case class Fixture(docs: List[(Long, String)], targetMod: Int)

  private val fixtureGen: Gen[Fixture] = for {
    n <- Gen.choose(1, 15)
    docs <- Gen.sequence[List[(Long, String)], (Long, String)](
      (0L until n.toLong).map(id => for {
        k <- Gen.choose(1, 5)
        ws <- Gen.listOfN(k, word)
      } yield (id, ws.mkString(" "))).toList)
    m <- Gen.choose(2, 4)
  } yield Fixture(docs, m)

  property("weights and scores match the BigInt model on random corpora") =
    forAll(fixtureGen) { f =>
      import spark.implicits._
      val docs = f.docs.toDF("doc_id", "text")
      val counts = Importance.bucketCounts(docs, "doc_id", "text", B)
      val tCounts = counts.filter(pmod(col("doc_id"), lit(f.targetMod)) === 0)
      val rows = counts.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val tC = rows.filter(_._1 % f.targetMod == 0)
        .groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
      val rC = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
      val (tT, rT) = (tC.values.sum, rC.values.sum)
      def w(b: Long): Long =
        (BigInt(1000000) * BigInt(tC.getOrElse(b, 0L) + 1) *
          BigInt(rT + B) /
          (BigInt(rC(b) + 1) * BigInt(tT + B))).toLong
      val weights = Importance.bucketWeights(tCounts, counts, B)
      val gotW = weights.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val wOk = gotW.keySet == rC.keySet && gotW.forall { case (b, v) => v == w(b) }
      val gotS = Importance.docScores(counts, weights).collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
      val sOk = f.docs.forall { case (id, _) =>
        val mine = rows.filter(_._1 == id)
        val n = mine.map(_._3).sum
        gotS(id) == ((n,
          (mine.map(r => BigInt(r._3) * BigInt(w(r._2))).sum / BigInt(n))
            .toLong))
      }
      wOk && sOk
    }

  property("scoreArrivals over the training corpus == docScores") =
    forAll(fixtureGen) { f =>
      import spark.implicits._
      val docs = f.docs.toDF("doc_id", "text")
      val counts = Importance.bucketCounts(docs, "doc_id", "text", B)
      val tCounts = counts.filter(pmod(col("doc_id"), lit(f.targetMod)) === 0)
      val weights = Importance.bucketWeights(tCounts, counts, B)
      val w0 = Importance.unseenWeight(tCounts, counts, B).head().getLong(0)
      def shape(d: org.apache.spark.sql.DataFrame) = d.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      shape(Importance.scoreArrivals(docs, "doc_id", "text", weights,
        w0, B)) == shape(Importance.docScores(counts, weights))
    }
}
