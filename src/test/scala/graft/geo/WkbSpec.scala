package graft.geo

import org.scalatest.funsuite.AnyFunSuite

/** Codec tests over the embedded corpus (bytes produced by the
  * independent Python assembler in `scripts/gen_wkb_fixtures.py`, so
  * reader and fixtures can't share a bug). Expected strings are the
  * reference contract (`udfs/tests/test_wkb_udfs.py:34-54`,
  * `udf_tools.py:55-107`). Randomized roundtrip properties live in
  * [[WkbProps]] (ScalaCheck).
  */
class WkbSpec extends AnyFunSuite {

  test("corpus: GeomType.ofHex matches the reference's expected strings") {
    WkbCorpus.cases.foreach { case (name, hex, expected) =>
      assert(GeomType.ofHex(hex) == expected, s"case $name")
    }
  }

  test("corpus: GeomType.ofBytes matches on decoded bytes") {
    WkbCorpus.cases.foreach { case (name, hex, expected) =>
      val bytes = Wkb.fromHex(hex).get
      assert(GeomType.ofBytes(bytes) == expected, s"case $name")
    }
  }

  test("invalid inputs produce the reference diagnostics") {
    assert(GeomType.ofBytes(null) == "Invalid (null input)")
    assert(GeomType.ofHex(null) == "Invalid (null input)")
    assert(GeomType.ofBytes(Array[Byte](1, 1)) == "Invalid (too short)")
    assert(GeomType.ofHex("zzzz") == "Invalid (not hex)")
    assert(GeomType.ofHex("010") == "Invalid (not hex)") // odd length
    assert(GeomType.ofHex("01 01 00 00 00") == "Point")  // spaces tolerated
  }

  test("unknown type ids are diagnosed, not thrown") {
    // little-endian type 999 — not in the 26-entry table
    val b = Array[Byte](1, (999 & 0xff).toByte, (999 >> 8).toByte, 0, 0)
    assert(GeomType.ofBytes(b) == "Unknown(999)")
  }

  test("exotic reference type ids resolve (Circle…AffinePlacement)") {
    def le(t: Int) = Array[Byte](1, (t & 0xff).toByte, ((t >> 8) & 0xff).toByte,
      ((t >> 16) & 0xff).toByte, ((t >> 24) & 0xff).toByte)
    assert(GeomType.ofBytes(le(18)) == "Circle")
    assert(GeomType.ofBytes(le(102)) == "AffinePlacement")
    assert(GeomType.ofBytes(le(17)) == "Triangle")
    // Parity quirk: the reference's 1025→BrepSolid table entry is
    // unreachable — its offset strip (1000≤t<2000 → Z) runs before the
    // lookup (`udf_tools.py:93-107`), so raw 1025 → "Unknown(25) Z".
    assert(GeomType.ofBytes(le(1025)) == "Unknown(25) Z")
  }

  test("the full type table resolves (reference udf_tools.py:12-40)") {
    def le(t: Int) = Array[Byte](1, (t & 0xff).toByte, ((t >> 8) & 0xff).toByte,
      ((t >> 16) & 0xff).toByte, ((t >> 24) & 0xff).toByte)
    // every id below 1000 is reachable and must match the table
    GeomType.names.filter(_._1 < 1000).foreach { case (id, name) =>
      assert(GeomType.ofBytes(le(id)) == name, s"id $id")
    }
    // ids 0–24 plus AffinePlacement(102) and BrepSolid(1025): 27 rows
    assert(GeomType.names.size == 27)
  }

  test("corpus: every fixture parses to a geometry AST") {
    WkbCorpus.cases.foreach { case (name, hex, _) =>
      assert(Wkb.read(Wkb.fromHex(hex).get).isDefined, s"case $name")
    }
  }

  test("stripSrid removes the SRID and flag, keeps everything else") {
    WkbCorpus.cases.filter(_._1.endsWith("_ewkb")).foreach { case (name, hex, expected) =>
      val ewkb = Wkb.fromHex(hex).get
      val stripped = Wkb.stripSrid(ewkb)
      assert(stripped.length == ewkb.length - 4, s"case $name")
      val h = Wkb.parseHeader(stripped).get
      assert(!h.hasSrid, s"case $name")
      assert(GeomType.ofBytes(stripped) == expected, s"case $name")
      // non-EWKB input is returned unchanged (same reference semantics)
      assert(Wkb.stripSrid(stripped) eq stripped, s"case $name idempotent")
    }
  }

  test("writeEwkb reproduces the independently-assembled EWKB fixtures byte for byte") {
    WkbCorpus.cases.filter(_._1.endsWith("_ewkb")).foreach { case (name, hex, _) =>
      val plainName = name.stripSuffix("_ewkb")
      val plainHex = WkbCorpus.cases.find(_._1 == plainName).get._2
      val g = Wkb.read(Wkb.fromHex(plainHex).get).get
      assert(Wkb.toHex(Wkb.writeEwkb(g, 4326)) == hex, s"case $name")
    }
  }

  test("big-endian headers parse (byte 0 = 0)") {
    // big-endian POINT(0 0): 00 00000001 + 16 zero bytes
    val be = Array[Byte](0, 0, 0, 0, 1) ++ Array.fill[Byte](16)(0)
    assert(GeomType.ofBytes(be) == "Point")
    assert(Wkb.read(be).isDefined)
  }

  test("hostile element counts are rejected, not allocated") {
    // little-endian LineString claiming 2^31-1 points in 9 bytes
    val b = Array[Byte](1, 2, 0, 0, 0, -1, -1, -1, 0x7f)
    assert(Wkb.read(b).isEmpty)
  }
}
