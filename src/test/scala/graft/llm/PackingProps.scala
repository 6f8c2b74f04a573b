package graft.llm

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.SparkTestSession

/** ScalaCheck: the two-level distributed exclusive prefix sum equals
  * the sequential fold definition for arbitrary non-negative weights,
  * sparse/offset id spaces, and any shard size — the bit-exactness
  * contract the q44 oracle relies on. */
object PackingProps extends Properties("Packing") with SparkTestSession {

  private val rowsGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(0, 60)
    ids <- Gen.listOfN(n, Gen.choose(0L, 5000L)).map(_.distinct)
    ws <- Gen.listOfN(ids.length, Gen.choose(0L, 1000L))
  } yield ids.zip(ws)

  private val shardGen: Gen[Long] = Gen.oneOf(1L, 2L, 7L, 64L, 4096L)

  property("equals the sequential fold for any ids/weights/shardSize") =
    forAll(rowsGen, shardGen) { (rows, shardSize) =>
      import spark.implicits._
      var run = 0L
      val expected = rows.sortBy(_._1).map { case (id, w) =>
        val c = run; run += w; id -> c
      }.toMap
      val got =
        if (rows.isEmpty) Map.empty[Long, Long]
        else Packing.exclusivePrefixSum(rows.toDF("id", "w"), "id", "w", shardSize)
          .select("id", "cum").collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == expected
    }
}
