package graft.geo

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property: the envelope of a linearized circular arc covers every
  * point of the TRUE arc within the sampling tolerance — the r8 apex
  * case (an arc bulging past its control-point bbox), now load-bearing
  * for the whole grid family ([[GeoGrid.envelope]] routes curved
  * geometries through linearization before cell assignment, so an
  * envelope short of the true curve would mis-cell geometries at cell
  * boundaries).
  *
  * Tolerance: at max angle step α the sampled chain's chords sit at
  * most the sagitta `r·(1−cos(α/2))` inside the true circle, so the
  * linearized envelope can undershoot the true-arc envelope by at most
  * that; it can never overshoot (every chain vertex lies ON the arc).
  */
object LinearizeProps extends Properties("LinearizeEnvelope") {

  private case class Arc(cx: Double, cy: Double, r: Double,
      a0: Double, sweep: Double) {
    def at(t: Double): (Double, Double) = {
      val a = a0 + sweep * t
      (cx + r * math.cos(a), cy + r * math.sin(a))
    }
  }

  private val genArc: Gen[Arc] = for {
    cx <- Gen.chooseNum(-1000.0, 1000.0)
    cy <- Gen.chooseNum(-1000.0, 1000.0)
    r <- Gen.chooseNum(0.5, 500.0)
    a0 <- Gen.chooseNum(0.0, 2 * math.Pi)
    mag <- Gen.chooseNum(0.3, 1.9 * math.Pi) // minor AND major arcs
    dir <- Gen.oneOf(1.0, -1.0)
  } yield Arc(cx, cy, r, a0, dir * mag)

  property("linearized envelope covers the true arc within the sagitta") =
    forAll(genArc) { arc =>
      val Seq(p0, p1, p2) = Seq(0.0, 0.5, 1.0).map(arc.at)
      val g = Wkb.GCircularString(Array(
        Array(p0._1, p0._2), Array(p1._1, p1._2), Array(p2._1, p2._2)),
        hasZ = false, hasM = false)
      val (minX, minY, maxX, maxY) = GeoGrid.envelope(g)
      val stepRad = math.toRadians(Linearize.DefaultMaxAngleStepDegrees)
      val tol = arc.r * (1.0 - math.cos(stepRad / 2.0)) +
        1e-9 * (1.0 + arc.r + math.abs(arc.cx) + math.abs(arc.cy))
      val samples = (0 to 256).map(i => arc.at(i / 256.0))
      val covered = samples.forall { case (x, y) =>
        x >= minX - tol && x <= maxX + tol && y >= minY - tol && y <= maxY + tol
      }
      // and the envelope never exceeds the true arc's own bbox: chain
      // vertices lie on the arc, so each envelope edge is reached by
      // some true-arc point
      val tx0 = samples.map(_._1).min; val tx1 = samples.map(_._1).max
      val ty0 = samples.map(_._2).min; val ty1 = samples.map(_._2).max
      val noOvershoot = minX >= tx0 - tol && maxX <= tx1 + tol &&
        minY >= ty0 - tol && maxY <= ty1 + tol
      covered && noOvershoot
    }
}
