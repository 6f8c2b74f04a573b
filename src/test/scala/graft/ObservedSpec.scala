package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `observe` metrics: the free numbers equal an exact second-pass
  * recount in batch, and surface per micro-batch in streaming
  * progress under the same name. */
class ObservedSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  test("batch: gate metrics ride the writing action and equal the recount") {
    val gated = graft.llm.TextAnalysis.ruleFilter(
      graft.Tables.documents(spark, dir), "doc_id", "text")
    val (observed, obs) = Observed.batch(gated, "gate",
      Observed.gateMetrics("kept", "n_tok"))
    // ONE action: the job that would write the curated output
    val out = java.nio.file.Files.createTempDirectory("obs").toString
    observed.write.mode("overwrite").parquet(s"$out/kept")
    val m = obs.get
    // exact recount (the second pass the observe makes unnecessary)
    val r = gated.agg(count(lit(1)), sum(when(col("kept"), 1L).otherwise(0L)),
        sum(when(col("kept"), col("n_tok")).otherwise(0L)))
      .collect()(0)
    assert(m("n_rows") === r.getLong(0))
    assert(m("n_kept") === r.getLong(1))
    assert(m("kept_tokens") === r.getLong(2))
    assert(r.getLong(1) > 0 && r.getLong(1) < r.getLong(0),
      "fixture sanity: the gate must actually split")
  }

  test("streaming: per-batch observed metrics under the same name") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val gated = graft.llm.TextAnalysis.ruleFilter(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val q = Observed.stream(gated, "gate",
        Observed.gateMetrics("kept", "n_tok"))
      .writeStream.format("memory").queryName("obs_out")
      .outputMode("append").start()
    try {
      in.addData((1L, "a solid document with enough words to pass the gate " +
        "and some more words of ordinary shape for the metrics to count"),
        (2L, "x"))
      q.processAllAvailable()
      val om = q.lastProgress.observedMetrics.get("gate")
      assert(om !== null, "observed metrics must surface in progress")
      assert(om.getAs[Long]("n_rows") === 2L)
      assert(om.getAs[Long]("n_kept") >= 0L &&
        om.getAs[Long]("n_kept") <= 2L)
    } finally q.stop()
  }
}
