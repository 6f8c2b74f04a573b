package graft.geo

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Algebraic invariants of the exact rational intersection area over
  * random simple polygons: self-identity, symmetry, the monotone area
  * bound, and Long-contract scorability consistency. Convex rings
  * come from sorted distinct angles on a circle; concave rings from
  * radially-jittered stars (angles strictly increasing ⇒ simple).
  * The invariants hold for the TRUE intersection area, so they are
  * compared at the BigInt level — `polyArea2Big` and
  * `intersectionArea2Big` are total in magnitude — and the Long
  * clamp is checked separately as its own contract (None exactly
  * when the FINAL doubled area exceeds Long range, on BOTH the
  * own-area and clip paths, r11's falsified invariant). */
object GeoStatsProps extends Properties("IntersectionArea") {

  /** n angles with every consecutive gap (closing gap included) in
    * [0.6, 1.4]·(2π/n) — all gaps < π even at n = 3, so the center
    * stays INTERIOR and the radial polygon is simple and star-shaped
    * about it for ANY positive radii (sorted-by-angle alone does NOT
    * guarantee simplicity: an external center with zigzag radii
    * self-intersects — the r12 generator bug). Per-vertex radius in
    * [rMin, rMax]: equal bounds give a convex circle polygon, a wide
    * band a concave star. Min gap ≥ 0.47 rad at r ≥ 300 keeps
    * micro-unit flooring from collapsing or reordering vertices. */
  private def genRing(rMin: Double, rMax: Double): Gen[Wkb.GPolygon] = for {
    n <- Gen.chooseNum(3, 8)
    cx <- Gen.chooseNum(-5000.0, 5000.0)
    cy <- Gen.chooseNum(-5000.0, 5000.0)
    jit <- Gen.listOfN(n, Gen.chooseNum(0.0, 1.0))
    radii <- Gen.listOfN(n, Gen.chooseNum(rMin, rMax))
  } yield {
    val step = 2 * math.Pi / n
    val angles = jit.zipWithIndex.map { case (u, i) => (i + 0.4 * u) * step }
    val ring = angles.zip(radii).map { case (a, r) =>
      Array(cx + r * math.cos(a), cy + r * math.sin(a)) }.toArray
    Wkb.GPolygon(Array(ring :+ ring.head), hasZ = false, hasM = false)
  }

  private val genConvex: Gen[Wkb.GPolygon] =
    Gen.chooseNum(500.0, 2000.0).flatMap(r => genRing(r, r))
  private val genSimple: Gen[Wkb.GPolygon] =
    Gen.oneOf(genConvex, genRing(300.0, 2000.0))

  private def big(a: Wkb.GPolygon, b: Wkb.GPolygon): (Option[BigInt], Boolean) =
    GeoStats.intersectionArea2Big(Array(a), Array(b))

  property("clip by self reproduces the polygon's own shoelace area") =
    forAll(genSimple) { a =>
      val (got, exact) = big(a, a)
      exact && got == GeoStats.polyArea2Big(Array(a))
    }

  property("intersection area is symmetric") =
    forAll(genSimple, genSimple) { (a, b) =>
      val (ab, ea) = big(a, b)
      val (ba, eb) = big(b, a)
      ea && eb && ab == ba
    }

  property("intersection area never exceeds either operand's area") =
    forAll(genSimple, genSimple) { (a, b) =>
      // the clip floors the exact rational, its operands are integer
      // shoelaces of the same floored rings — the floor can undershoot
      // but never exceed the bound; compared in BigInt so a true area
      // beyond Long range cannot falsify the invariant
      (for {
        ab <- big(a, b)._1
        aa <- GeoStats.polyArea2Big(Array(a))
        bb <- GeoStats.polyArea2Big(Array(b))
      } yield ab <= aa.min(bb)).getOrElse(false)
    }

  property("Long clamp: Fp is Big exactly when Big fits, else None") =
    forAll(genSimple, genSimple) { (a, b) =>
      val own = GeoStats.polyArea2Big(Array(a))
      val ownFp = GeoStats.polyArea2Fp(Array(a))
      val clip = big(a, b)._1
      val clipFp = GeoStats.intersectionArea2Fp(Array(a), Array(b))._1
      def clamp(x: Option[BigInt]): Option[Long] =
        x.filter(_ <= BigInt(Long.MaxValue)).map(_.toLong)
      ownFp == clamp(own) && clipFp == clamp(clip)
    }

  property("far-translated polygons do not intersect") =
    forAll(genSimple) { a =>
      val shifted = Wkb.GPolygon(
        a.rings.map(_.map(v => Array(v(0) + 50000.0, v(1)))),
        hasZ = false, hasM = false)
      big(a, shifted) == ((Some(BigInt(0)), true))
    }
}
