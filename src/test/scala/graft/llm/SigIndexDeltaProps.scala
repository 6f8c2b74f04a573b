package graft.llm

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.SparkTestSession

/** ScalaCheck: [[MinHashLSH.indexDelta]] equals a full
  * [[MinHashLSH.signatureIndex]] rebuild on ARBITRARY corpora and
  * splits — bands, counts, and sets all three. The generator draws
  * from a tiny vocabulary so bucket populations cross the cap in both
  * directions by construction (dup-heavy corpora), and the split
  * point is arbitrary, so every cap transition the planted spec pins
  * also gets hit at random. */
object SigIndexDeltaProps extends Properties("SigIndexDelta")
    with SparkTestSession {

  private case class Fixture(old: List[(Long, String)],
      arr: List[(Long, String)], cap: Int)

  private val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps")

  private val fixtureGen: Gen[Fixture] = for {
    nOld <- Gen.choose(0, 12)
    nArr <- Gen.choose(0, 8)
    cap <- Gen.oneOf(0, 1, 2, 3)
    // 2-3 word docs from a 5-word vocab: heavy hash collisions, so
    // buckets really do sit at/over/under the cap
    mk = (id: Long) => for {
      k <- Gen.choose(2, 3)
      ws <- Gen.listOfN(k, word)
    } yield (id, ws.mkString(" "))
    old <- Gen.sequence[List[(Long, String)], (Long, String)](
      (0L until nOld.toLong).map(mk).toList)
    arr <- Gen.sequence[List[(Long, String)], (Long, String)](
      (100L until (100L + nArr)).map(mk).toList)
  } yield Fixture(old, arr, cap)

  private def bandSet(ix: MinHashLSH.SigIndex) =
    ix.bands.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getString(2))).toSet
  private def countSet(ix: MinHashLSH.SigIndex) =
    ix.counts.collect().map(r =>
      (r.getInt(0), r.getString(1), r.getLong(2))).toSet
  private def setIds(ix: MinHashLSH.SigIndex) =
    ix.sets.select("doc_id").collect().map(_.getLong(0)).toSet

  property("indexDelta(build(old), arr) == build(old ∪ arr), all frames") =
    forAll(fixtureGen) { f =>
      import spark.implicits._
      val old = f.old.toDF("doc_id", "text")
      val arr = f.arr.toDF("doc_id", "text")
      val folded = MinHashLSH.indexDelta(
        MinHashLSH.signatureIndex(old, "doc_id", "text", 2, 4, 1, f.cap),
        arr, "doc_id", "text", 2, 4, 1, f.cap)
      val rebuilt = MinHashLSH.signatureIndex(old.unionByName(arr),
        "doc_id", "text", 2, 4, 1, f.cap)
      bandSet(folded) == bandSet(rebuilt) &&
        countSet(folded) == countSet(rebuilt) &&
        setIds(folded) == setIds(rebuilt)
    }
}
