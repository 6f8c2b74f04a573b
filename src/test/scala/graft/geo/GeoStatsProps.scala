package graft.geo

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Algebraic invariants of the exact rational intersection area over
  * random convex polygons (vertices on a circle — sorted distinct
  * angles guarantee convexity, and the large radius keeps micro-unit
  * flooring from ever flipping an orientation sign):
  * self-identity, symmetry, and the monotone area bound. These hold
  * for the TRUE intersection area, so any drift in the clip's
  * rational arithmetic shows up as a violated invariant. */
object GeoStatsProps extends Properties("IntersectionArea") {

  /** n distinct angles ≥ 0.15 rad apart, radius 500–2000 units. */
  private val genConvex: Gen[Wkb.GPolygon] = for {
    n <- Gen.chooseNum(3, 8)
    r <- Gen.chooseNum(500.0, 2000.0)
    cx <- Gen.chooseNum(-5000.0, 5000.0)
    cy <- Gen.chooseNum(-5000.0, 5000.0)
    raw <- Gen.listOfN(n, Gen.chooseNum(0.0, 2 * math.Pi))
  } yield {
    // compress into [0, 2π − n·0.15], then space by 0.15 rad: strictly
    // increasing, total span < 2π → convex, and no two angles collapse
    // under micro-unit flooring
    val scale = (2 * math.Pi - n * 0.15) / (2 * math.Pi)
    val sorted = raw.sorted
    val spaced = sorted.zipWithIndex.map { case (a, i) => a * scale + i * 0.15 }
    val ring = spaced.map(a =>
      Array(cx + r * math.cos(a), cy + r * math.sin(a))).toArray
    Wkb.GPolygon(Array(ring :+ ring.head), hasZ = false, hasM = false)
  }

  private def area(a: Wkb.GPolygon, b: Wkb.GPolygon): (Option[Long], Boolean) =
    GeoStats.intersectionArea2Fp(Array(a), Array(b))

  property("clip by self reproduces the polygon's own shoelace area") =
    forAll(genConvex) { a =>
      val (got, exact) = area(a, a)
      exact && got == GeoStats.polyArea2Fp(Array(a))
    }

  property("intersection area is symmetric") =
    forAll(genConvex, genConvex) { (a, b) =>
      val (ab, ea) = area(a, b)
      val (ba, eb) = area(b, a)
      ea && eb && ab == ba
    }

  property("intersection area never exceeds either operand's area") =
    forAll(genConvex, genConvex) { (a, b) =>
      val (ab, _) = area(a, b)
      val bound = math.min(
        GeoStats.polyArea2Fp(Array(a)).getOrElse(Long.MaxValue),
        GeoStats.polyArea2Fp(Array(b)).getOrElse(Long.MaxValue))
      // the clip floors the exact rational, its operands are integer
      // shoelaces of the same floored rings — the floor can undershoot
      // but never exceed the bound
      ab.exists(_ <= bound)
    }

  property("far-translated polygons do not intersect") =
    forAll(genConvex) { a =>
      val shifted = Wkb.GPolygon(
        a.rings.map(_.map(v => Array(v(0) + 50000.0, v(1)))),
        hasZ = false, hasM = false)
      area(a, shifted) == ((Some(0L), true))
    }
}
