package graft.llm

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.SparkTestSession

/** ScalaCheck: incremental cluster maintenance equals the full
  * recompute on ARBITRARY planted graphs — old graph clustered first,
  * arrivals + new edges folded in with [[Dedup.ccDelta]], result
  * compared label-for-label against [[Dedup.connectedComponents]] on
  * the union. Generators deliberately produce the hard shapes: new
  * docs bridging several old clusters, late old↔old evidence merging
  * history, isolated arrivals, and empty deltas. */
object CcDeltaProps extends Properties("CcDelta") with SparkTestSession {

  // a small world: old vertices 0..nOld-1, new vertices 100..100+nNew-1
  private case class Fixture(oldV: List[Long], newV: List[Long],
      oldE: List[(Long, Long)], newE: List[(Long, Long)])

  private val fixtureGen: Gen[Fixture] = for {
    nOld <- Gen.choose(1, 14)
    nNew <- Gen.choose(0, 6)
    oldV = (0L until nOld.toLong).toList
    newV = (100L until (100L + nNew)).toList
    nOldE <- Gen.choose(0, 20)
    oldE <- Gen.listOfN(nOldE, for {
      a <- Gen.oneOf(oldV)
      b <- Gen.oneOf(oldV)
    } yield (a, b))
    // new edges draw endpoints from BOTH worlds: new↔old bridges,
    // new↔new chains, and late old↔old evidence
    nNewE <- Gen.choose(0, 12)
    newE <- if (newV.isEmpty && oldV.isEmpty) Gen.const(Nil)
      else Gen.listOfN(nNewE, for {
        a <- Gen.oneOf(oldV ++ newV)
        b <- Gen.oneOf(oldV ++ newV)
      } yield (a, b))
  } yield Fixture(oldV, newV, oldE, newE)

  property("ccDelta(cc(old), arrivals) == cc(old ∪ arrivals), label-for-label") =
    forAll(fixtureGen) { f =>
      import spark.implicits._
      // self-loops are legal input; drop nothing, the operator must cope
      val oldE = f.oldE.toDF("doc_a", "doc_b")
      val newE = f.newE.toDF("doc_a", "doc_b")
      val existing = Dedup.connectedComponents(f.oldV.toDF("doc_id"), oldE)
      val delta = Dedup.ccDelta(existing, f.newV.toDF("doc_id"), newE)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val full = Dedup.connectedComponents(
          (f.oldV ++ f.newV).toDF("doc_id"), oldE.unionByName(newE))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val same = delta == full
      if (!same) println(s"MISMATCH fixture=$f\n delta=$delta\n full=$full")
      same
    }
}
