package graft.layout

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The bucketed-layout contract: a join of two co-bucketed tables
  * reads both sides pre-partitioned — NO Exchange anywhere in the
  * plan — while the identical join on unbucketed copies shuffles
  * both sides. Results are identical either way. */
class BucketingSpec extends AnyFunSuite with SparkTestSession {

  test("co-bucketed join: zero Exchange; unbucketed twin shuffles; equal results") {
    import spark.implicits._
    val facts = (1L to 2000L).map(i => (i % 97, i, i * 3 % 1000))
      .toDF("k", "id", "v")
    val dims = (0L until 97L).map(i => (i, s"name$i")).toDF("k", "name")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(facts, "b_facts", buckets = 4, key = "k")
      Bucketing.writeBucketed(dims, "b_dims", buckets = 4, key = "k")
      facts.write.mode("overwrite").saveAsTable("u_facts")
      dims.write.mode("overwrite").saveAsTable("u_dims")

      def planOf(l: String, r: String) = spark.table(l)
        .join(spark.table(r), "k")
        .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))

      val bucketed = planOf("b_facts", "b_dims")
      val bPlan = bucketed.queryExecution.executedPlan.toString
      assert(!bPlan.contains("Exchange"),
        s"co-bucketed join must not shuffle:\n$bPlan")

      val plain = planOf("u_facts", "u_dims")
      val pPlan = plain.queryExecution.executedPlan.toString
      assert(pPlan.contains("Exchange"),
        s"unbucketed twin should shuffle (sanity):\n$pPlan")

      // layout never changes answers
      val key = (r: org.apache.spark.sql.Row) =>
        (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(bucketed.collect().map(key).toSet === plain.collect().map(key).toSet)

      // and the bucket spec survives in the catalog (write-once, reuse forever)
      val ddl = spark.sql("DESCRIBE TABLE EXTENDED b_facts")
        .collect().map(_.mkString("|")).mkString("\n")
      assert(ddl.contains("Num Buckets") && ddl.contains("4"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      Seq("b_facts", "b_dims", "u_facts", "u_dims")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
