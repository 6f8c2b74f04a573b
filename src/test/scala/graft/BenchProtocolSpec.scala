package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench record protocol's pure pieces (r18 verdict asks #2/#3):
  * the recorded per-query number is the min over ALL iterations — steal
  * only inflates wall, so every iteration is a valid upper bound and the
  * global min is the tightest one; the r18 clean-preferred min discarded
  * a 1.49 s dirty iteration and recorded 2.37 s for q192. */
class BenchProtocolSpec extends AnyFunSuite {

  test("recordedMin is the global min — never above the min over any subset") {
    // the q192 incident shape: times [1.49, 101.4, 2.37], clean = last only
    val walls = Seq(1.49, 101.4, 2.37)
    val cleanOnly = Seq(2.37)
    assert(BenchProtocol.recordedMin(walls) == 1.49)
    assert(BenchProtocol.recordedMin(walls) <=
      BenchProtocol.recordedMin(cleanOnly))
  }

  test("recordedMin(all) <= recordedMin(clean) for arbitrary splits") {
    val all = Seq(3.0, 0.7, 2.2, 5.1)
    for (cleanMask <- all.indices.toSet.subsets() if cleanMask.nonEmpty) {
      val clean = cleanMask.toSeq.map(all)
      assert(BenchProtocol.recordedMin(all) <=
        BenchProtocol.recordedMin(clean))
    }
  }

  test("deadline is measured from JVM start and 0 disables it") {
    val start = 1000L * 1000
    assert(!BenchProtocol.expired(start, start + 2699 * 1000L, 2700))
    assert(BenchProtocol.expired(start, start + 2700 * 1000L, 2700))
    assert(!BenchProtocol.expired(start, start + 100000 * 1000L, 0))
    assert(!BenchProtocol.expired(start, start + 100000 * 1000L, -1))
  }

  test("Verify cheap-first ordering: known costs ascend, unknown last by name") {
    val prior = Map("q_b" -> 2.0, "q_a" -> 5.0, "q_c" -> 0.3)
    val names = Seq("q_a", "q_b", "q_z", "q_c", "q_m")
    assert(Verify.cheapFirst(names, prior) ==
      Seq("q_c", "q_b", "q_a", "q_m", "q_z"))
  }

  test("Verify bench prior parses the detail file's queries map") {
    val tmp = java.nio.file.Files.createTempFile("bench_detail", ".json")
    java.nio.file.Files.writeString(tmp,
      """{"metric":"total","value":9.9,"unit":"sec","queries":{"q1":1.5,"q2":0.25},"times":{"q1":[1.5]}}""")
    val m = Verify.benchPrior(tmp.toString)
    assert(m == Map("q1" -> 1.5, "q2" -> 0.25))
    assert(Verify.benchPrior("/nonexistent/path.json") == Map.empty)
    java.nio.file.Files.delete(tmp)
  }
}
