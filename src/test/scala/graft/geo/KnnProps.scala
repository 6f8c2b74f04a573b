package graft.geo

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.SparkTestSession

/** Adversarial property coverage for [[GeoGrid.knnJoin]] vs a
  * brute-force oracle — the GeoStatsProps treatment applied to the
  * grid family: random clouds drawn from a mix that deliberately
  * includes the degenerate shapes the ring-expansion proof must
  * survive (everything crammed into one cell; corpus smaller than k;
  * queries far outside the corpus box exercising the
  * jump-to-first-useful-ring; integer-lattice coordinates forcing
  * exact dist2 ties across ring boundaries, where the (dist2, id)
  * tie-break decides the k-th slot). Fewer cases than a pure-JVM
  * property — each run is a full multi-round distributed search. */
object KnnProps extends Properties("KnnJoin") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withMaxDiscardRatio(10)

  private lazy val spark = SparkTestSession.session

  private final case class Cloud(qs: Seq[(Long, Double, Double)],
      cs: Seq[(Long, Double, Double)], k: Int, cellSize: Double, tag: String)

  /** Integer-lattice coordinates: ties are the NORM, not the
    * exception — symmetric lattice offsets collide in dist2 exactly. */
  private val genLattice: Gen[Cloud] = for {
    nq <- Gen.chooseNum(5, 15)
    nc <- Gen.chooseNum(4, 25)
    k <- Gen.chooseNum(1, 5)
    cell <- Gen.oneOf(5.0, 10.0)
    qxy <- Gen.listOfN(nq, Gen.zip(Gen.chooseNum(-20, 20), Gen.chooseNum(-20, 20)))
    cxy <- Gen.listOfN(nc, Gen.zip(Gen.chooseNum(-20, 20), Gen.chooseNum(-20, 20)))
  } yield Cloud(
    qxy.zipWithIndex.map { case ((x, y), i) => (i.toLong, x.toDouble, y.toDouble) },
    cxy.zipWithIndex.map { case ((x, y), i) => (100L + i, x.toDouble, y.toDouble) },
    k, cell, "lattice")

  /** Whole corpus inside ONE grid cell; queries split between that
    * cell and far outside it. */
  private val genOneCell: Gen[Cloud] = for {
    nc <- Gen.chooseNum(3, 10)
    k <- Gen.chooseNum(1, 4)
    cxy <- Gen.listOfN(nc, Gen.zip(Gen.chooseNum(1.0, 9.0), Gen.chooseNum(1.0, 9.0)))
    far <- Gen.listOfN(3, Gen.zip(Gen.chooseNum(300.0, 2000.0), Gen.chooseNum(-800.0, 800.0)))
    near <- Gen.listOfN(3, Gen.zip(Gen.chooseNum(0.5, 9.5), Gen.chooseNum(0.5, 9.5)))
  } yield Cloud(
    (near ++ far).zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) },
    cxy.zipWithIndex.map { case ((x, y), i) => (100L + i, x, y) },
    k, 10.0, "one-cell")

  /** Corpus strictly smaller than k: short result lists, and the
    * cover-the-whole-box retirement is the only way out. */
  private val genTinyCorpus: Gen[Cloud] = for {
    nc <- Gen.chooseNum(1, 3)
    k <- Gen.chooseNum(nc + 1, nc + 4)
    cxy <- Gen.listOfN(nc, Gen.zip(Gen.chooseNum(-50.0, 50.0), Gen.chooseNum(-50.0, 50.0)))
    qxy <- Gen.listOfN(6, Gen.zip(Gen.chooseNum(-120.0, 120.0), Gen.chooseNum(-120.0, 120.0)))
  } yield Cloud(
    qxy.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) },
    cxy.zipWithIndex.map { case ((x, y), i) => (100L + i, x, y) },
    k, 10.0, "tiny-corpus")

  private val genCloud: Gen[Cloud] =
    Gen.frequency(2 -> genLattice, 1 -> genOneCell, 1 -> genTinyCorpus)

  private def bruteKnn(c: Cloud): Set[(Long, Long, Long, Long)] = {
    def fp(v: Double) = math.floor(v * 1e6).toLong
    c.qs.flatMap { case (qid, qx, qy) =>
      c.cs.map { case (nid, nx, ny) =>
        val dx = fp(qx) - fp(nx); val dy = fp(qy) - fp(ny)
        (nid, dx * dx + dy * dy)
      }.sortBy { case (nid, d2) => (d2, nid) }.take(c.k).zipWithIndex
        .map { case ((nid, d2), i) => (qid, nid, d2, i + 1L) }
    }.toSet
  }

  property("knnJoin equals brute force, ties and short lists included") =
    forAll(genCloud) { cloud =>
      import spark.implicits._
      def pt(x: Double, y: Double) =
        Wkb.write(Wkb.GPoint(Array(x, y), hasZ = false, hasM = false))
      val queries = cloud.qs.map { case (i, x, y) => (i, pt(x, y)) }.toDF("id", "wkb")
      val corpus = cloud.cs.map { case (i, x, y) => (i, pt(x, y)) }.toDF("id", "wkb")
      val got = GeoGrid.knnJoin(queries, col("id"), col("wkb"),
          corpus, col("id"), col("wkb"), cloud.cellSize, cloud.k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      got == bruteKnn(cloud)
    }
}
