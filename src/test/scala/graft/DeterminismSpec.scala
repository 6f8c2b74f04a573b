package graft

import org.scalatest.funsuite.AnyFunSuite

/** Empirical pin for DESIGN.md §4: results are engineered to be
  * partition-invariant (fixed-point arithmetic, content-pure hashes,
  * unique-id tie-breaks), so re-planning the same query under a
  * different shuffle-partition count must yield byte-identical rows.
  * Exercises the hash-sensitive families: LSH pairing, exact
  * quantiles, hash sampling, trained IVF, vocabulary scoring. */
class DeterminismSpec extends AnyFunSuite with SparkTestSession {

  private val Dir = "/root/testdata/sf0.001"

  // sorted Seq, NOT Set: a partition-dependent change in duplicate-row
  // MULTIPLICITY (exactly the class of bug repartitioning exposes in
  // pair generators) must fail the compare
  private def run(q: String): Seq[String] = {
    graft.llm.Caches.unpersistAll(blocking = true)
    SparkEntry.queries(q)(spark, Dir).collect().map(_.toString).toSeq.sorted
  }

  test("hash-sensitive queries are invariant to the shuffle-partition count") {
    val queries = Seq("q21_minhash_pairs", "q40_token_quantiles",
      "q52_group_sample", "q66_ivf_trained", "q71_surprisal")
    for (q <- queries) {
      val base = run(q)
      assert(base.nonEmpty, s"$q returned nothing at $Dir")
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      try {
        assert(run(q) == base,
          s"$q changed under a different shuffle-partition count — " +
            "a float aggregate or partition-dependent tie-break leaked in")
      } finally spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
  }
}
