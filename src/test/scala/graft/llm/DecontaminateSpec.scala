package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Decontamination: the Bloom-prefiltered path must be bit-identical
  * to the exact path (false positives are erased by the confirming
  * join), and planted benchmark leakage must surface. */
class DecontaminateSpec extends AnyFunSuite with SparkTestSession {

  private def docs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("planted leakage is flagged; clean docs are not") {
    val evalDoc = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep dark forest tonight"
    val train = docs(Seq(
      (1L, s"prefix text before the leak $evalDoc suffix text after"),
      (2L, "completely unrelated content about database systems and " +
        "distributed query processing at petabyte scale every day")))
    val eval = docs(Seq((100L, evalDoc)))
    val exact = Decontaminate.contaminated(train, eval, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(exact.contains(1L), "doc embedding the eval text must be flagged")
    assert(exact(1L) > 0L)
    assert(!exact.contains(2L), "unrelated doc must not be flagged")
  }

  test("bloom path is bit-identical to the exact path on real documents") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val train = d.filter(pmod(col("doc_id"), lit(50)) =!= 0)
    val eval = d.filter(pmod(col("doc_id"), lit(50)) === 0)
    val exact = Decontaminate.contaminated(train, eval, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(exact.nonEmpty, "sf0.001 split should produce some contamination")
    // a tight filter (1% fpp) and a saturated one (40% fpp — many false
    // positives reach the confirming join) must both reproduce it
    for (fpp <- Seq(0.01, 0.4)) {
      val bloomed = Decontaminate.contaminatedBloom(train, eval, "doc_id", "text", fpp)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(bloomed == exact, s"bloom path diverged at fpp=$fpp")
    }
  }

  test("bloom prefilter sits scan-side: below the confirming join's exchange") {
    import org.apache.spark.sql.execution.FilterExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Decontaminate.contaminatedBloom(
      d.filter(pmod(col("doc_id"), lit(50)) =!= 0),
      d.filter(pmod(col("doc_id"), lit(50)) === 0), "doc_id", "text")
    val udfFilters = graft.PlanNodes.all(out.queryExecution.executedPlan).collect {
      case f: FilterExec if f.condition.toString.contains("UDF") => f
    }
    assert(udfFilters.nonEmpty, "the Bloom mightContain prefilter vanished from the plan")
    // the point of the operator: the filter runs before the exchange,
    // so pruned fingerprints never reach the shuffle
    assert(udfFilters.forall(f =>
      graft.PlanNodes.all(f.child).forall(!_.isInstanceOf[ShuffleExchangeLike])),
      "Bloom prefilter floated above a shuffle — it must prune scan-side")
  }

  test("empty eval set yields empty contamination, not a failure") {
    val train = docs(Seq((1L, "some training text that is long enough to fingerprint")))
    val eval = docs(Seq.empty[(Long, String)])
    assert(Decontaminate.contaminated(train, eval, "doc_id", "text").count() == 0L)
    assert(Decontaminate.contaminatedBloom(train, eval, "doc_id", "text").count() == 0L)
  }
}
