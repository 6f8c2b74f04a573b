package graft.geo

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck roundtrip properties for the WKB codec (sbt runs
  * `Properties` natively — no scalatest bridge needed offline).
  */
object WkbProps extends Properties("Wkb") {

  private val genFlags: Gen[(Boolean, Boolean)] =
    Gen.oneOf((false, false), (true, false), (false, true), (true, true))
  private val genCoord: Gen[Double] = Gen.chooseNum(-1e6, 1e6)

  private def genPointArr(dims: Int): Gen[Array[Double]] =
    Gen.listOfN(dims, genCoord).map(_.toArray)

  private def genPts(dims: Int, min: Int, max: Int): Gen[Array[Array[Double]]] =
    Gen.chooseNum(min, max).flatMap(n => Gen.listOfN(n, genPointArr(dims)).map(_.toArray))

  private val genGeom: Gen[Wkb.Geom] = genFlags.flatMap { case (z, m) =>
    val dims = 2 + (if (z) 1 else 0) + (if (m) 1 else 0)
    val point = genPointArr(dims).map(Wkb.GPoint(_, z, m))
    val line = genPts(dims, 2, 6).map(Wkb.GLineString(_, z, m))
    val circ = Gen.oneOf(3, 5).flatMap(n =>
      Gen.listOfN(n, genPointArr(dims)).map(l => Wkb.GCircularString(l.toArray, z, m)))
    val poly = Gen.chooseNum(1, 3).flatMap(nr =>
      Gen.listOfN(nr, genPts(dims, 4, 6)).map(rs => Wkb.GPolygon(rs.toArray, z, m)))
    val multiLine = Gen.chooseNum(1, 3).flatMap(n =>
      Gen.listOfN(n, line).map(ls => Wkb.GMultiLineString(ls.toArray, z, m)))
    val multiPoly = Gen.chooseNum(1, 2).flatMap(n =>
      Gen.listOfN(n, poly).map(ps => Wkb.GMultiPolygon(ps.toArray, z, m)))
    val coll = Gen.chooseNum(1, 3).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(point, line, poly)).map(gs => Wkb.GCollection(gs.toArray, z, m)))
    Gen.oneOf(point, line, circ, poly, multiLine, multiPoly, coll)
  }

  property("write → read → write is byte-identical") = forAll(genGeom) { g =>
    val bytes = Wkb.write(g)
    Wkb.read(bytes) match {
      case Some(back) => java.util.Arrays.equals(Wkb.write(back), bytes)
      case None       => false
    }
  }

  property("written header decodes to the geometry's type and flags") =
    forAll(genGeom) { g =>
      val h = Wkb.parseHeader(Wkb.write(g)).get
      h.baseType == Wkb.typeId(g) && h.hasZ == g.hasZ && h.hasM == g.hasM && !h.hasSrid
    }

  property("truncations never crash the reader") =
    forAll(genGeom, Gen.chooseNum(0, 48)) { (g, cut) =>
      val bytes = Wkb.write(g)
      val truncated = bytes.take(math.max(0, bytes.length - cut))
      val parsed = Wkb.read(truncated) // must not throw
      val shortDiag = truncated.length >= 5 ||
        GeomType.ofBytes(truncated) == "Invalid (too short)"
      (parsed.isDefined || parsed.isEmpty) && shortDiag
    }

  property("EWKB write → read → ISO write matches ISO write directly") =
    forAll(genGeom, Gen.chooseNum(1, 999999)) { (g, srid) =>
      val ewkb = Wkb.writeEwkb(g, srid)
      val h = Wkb.parseHeader(ewkb).get
      val back = Wkb.read(ewkb)
      h.hasSrid && h.hasZ == g.hasZ && h.hasM == g.hasM &&
        back.isDefined &&
        java.util.Arrays.equals(Wkb.write(back.get), Wkb.write(g)) &&
        java.util.Arrays.equals(Wkb.stripSrid(ewkb).drop(5), ewkb.drop(9))
    }

  property("hex roundtrip") =
    forAll(Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte))) { l =>
      val b = l.toArray
      java.util.Arrays.equals(Wkb.fromHex(Wkb.toHex(b)).get, b)
    }

  property("linearized arcs: vertices on circle, step bound respected") = {
    val genArcTriple: Gen[(Array[Double], Array[Double], Array[Double])] = for {
      cx <- Gen.chooseNum(-100.0, 100.0); cy <- Gen.chooseNum(-100.0, 100.0)
      r <- Gen.chooseNum(0.5, 50.0)
      t0 <- Gen.chooseNum(0.0, 2 * math.Pi)
      d1 <- Gen.chooseNum(0.1, 2.5); d2 <- Gen.chooseNum(0.1, 2.5)
    } yield {
      def pt(t: Double) = Array(cx + r * math.cos(t), cy + r * math.sin(t))
      (pt(t0), pt(t0 + d1), pt(t0 + d1 + d2))
    }
    forAll(genArcTriple, Gen.chooseNum(1.0, 30.0)) { case ((p0, p1, p2), step) =>
      val pts = Linearize.arcPoints(Array(p0, p1, p2), 2, step)
      // circle through the triple (recompute independently)
      val d = 2.0 * (p0(0) * (p1(1) - p2(1)) + p1(0) * (p2(1) - p0(1)) + p2(0) * (p0(1) - p1(1)))
      val s0 = p0(0) * p0(0) + p0(1) * p0(1)
      val s1 = p1(0) * p1(0) + p1(1) * p1(1)
      val s2 = p2(0) * p2(0) + p2(1) * p2(1)
      val ux = (s0 * (p1(1) - p2(1)) + s1 * (p2(1) - p0(1)) + s2 * (p0(1) - p1(1))) / d
      val uy = (s0 * (p2(0) - p1(0)) + s1 * (p0(0) - p2(0)) + s2 * (p1(0) - p0(0))) / d
      val r = math.hypot(p0(0) - ux, p0(1) - uy)
      val onCircle = pts.forall(p => math.abs(math.hypot(p(0) - ux, p(1) - uy) - r) < 1e-6 * (1 + r))
      val angles = pts.map(p => math.atan2(p(1) - uy, p(0) - ux))
      val stepOk = angles.sliding(2).forall { case Array(a, b) =>
        val delta = math.abs(((b - a + math.Pi) % (2 * math.Pi) + 2 * math.Pi) % (2 * math.Pi) - math.Pi)
        delta <= math.toRadians(step) + 1e-9
      }
      val endpointsExact = java.util.Arrays.equals(pts.head, p0) &&
        java.util.Arrays.equals(pts.last, p2)
      Prop(onCircle && stepOk && endpointsExact)
    }
  }

  property("num_geoms: component count for multis, 1 for scalars, garbage → null") =
    forAll(genGeom, Gen.chooseNum(1, 48)) { (g, cut) =>
      val bytes = Wkb.write(g)
      val expected: Long = g match {
        case m: Wkb.GMultiLineString => m.geoms.length.toLong
        case m: Wkb.GMultiPolygon    => m.geoms.length.toLong
        case c: Wkb.GCollection      => c.geoms.length.toLong
        case _                       => 1L
      }
      val full = GeoFunctions.numGeoms(bytes)
      // truncated or null input must diagnose as null, never throw
      val truncated = GeoFunctions.numGeoms(bytes.take(math.max(0, bytes.length - cut)))
      (full != null && full.longValue == expected) &&
        GeoFunctions.numGeoms(null) == null &&
        (truncated == null || truncated.longValue >= 1L)
    }

  property("envelope covers every vertex of any linear geometry") = {
    def vertices(g: Wkb.Geom): Seq[Array[Double]] = g match {
      case Wkb.GPoint(c, _, _)            => Seq(c)
      case Wkb.GLineString(ps, _, _)      => ps.toSeq
      case Wkb.GPolygon(rs, _, _)         => rs.toSeq.flatten
      case Wkb.GMultiPoint(gs, _, _)      => gs.toSeq.flatMap(vertices)
      case Wkb.GMultiLineString(gs, _, _) => gs.toSeq.flatMap(vertices)
      case Wkb.GMultiPolygon(gs, _, _)    => gs.toSeq.flatMap(vertices)
      case Wkb.GCollection(gs, _, _)      => gs.toSeq.flatMap(vertices)
      case _                              => Seq.empty
    }
    // linear-only: a curved geometry's envelope follows the SAMPLED
    // arc, which may legitimately exceed the control points
    val genLinear = genGeom.retryUntil({
      case _: Wkb.GCircularString => false
      case _                      => true
    }, 100)
    forAll(genLinear) { g =>
      val vs = vertices(g)
      val (x0, y0, x1, y1) = GeoGrid.envelope(g)
      vs.isEmpty || vs.forall(v =>
        x0 <= v(0) && v(0) <= x1 && y0 <= v(1) && v(1) <= y1)
    }
  }

  property("shoelace area: translation-invariant and orientation-independent") = {
    // dyadic (k/8) coordinates and integer offsets: every sum and the
    // ·10⁶ product are EXACT doubles, so floor can never straddle a
    // boundary differently before and after translation — continuous
    // coordinates would make this property flaky within float ulps
    val genRect = for {
      x0 <- Gen.chooseNum(-4000, 4000).map(_ * 0.125)
      y0 <- Gen.chooseNum(-4000, 4000).map(_ * 0.125)
      w <- Gen.chooseNum(1, 1600).map(_ * 0.125)
      h <- Gen.chooseNum(1, 1600).map(_ * 0.125)
      dx <- Gen.chooseNum(-1000000, 1000000).map(_.toDouble)
      dy <- Gen.chooseNum(-1000000, 1000000).map(_.toDouble)
    } yield (x0, y0, x0 + w, y0 + h, dx, dy)
    forAll(genRect) { case (x0, y0, x1, y1, dx, dy) =>
      def rect(a: Double, b: Double, c: Double, d: Double, rev: Boolean) = {
        val ring = Array(Array(a, b), Array(c, b), Array(c, d), Array(a, d), Array(a, b))
        Wkb.GPolygon(Array(if (rev) ring.reverse else ring), false, false)
      }
      val base = GeoStats.polyArea2Fp(Array(rect(x0, y0, x1, y1, rev = false)))
      val moved = GeoStats.polyArea2Fp(Array(
        rect(x0 + dx, y0 + dy, x1 + dx, y1 + dy, rev = false)))
      val reversed = GeoStats.polyArea2Fp(Array(rect(x0, y0, x1, y1, rev = true)))
      base.isDefined && base == moved && base == reversed
    }
  }
}
