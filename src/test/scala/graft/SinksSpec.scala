package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The catalog-facing operator surface from SURVEY.md §2.2 that no
  * query exercises: DDL (CREATE SCHEMA), managed-table sink
  * (saveAsTable overwrite), temp-view registration/drop, and the
  * small actions (cache/collect/first/count). Mirrors the reference's
  * usage shapes (`test_contours_udf.py:25,47-49`,
  * `test_wkb_udfs.py:110-111`). */
class SinksSpec extends AnyFunSuite with SparkTestSession {

  test("CREATE SCHEMA + saveAsTable overwrite + read-back") {
    import spark.implicits._
    spark.sql("CREATE SCHEMA IF NOT EXISTS graft_test")
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    df.write.mode("overwrite").saveAsTable("graft_test.sink_check")
    // overwrite again to exercise the replace path (reference mode)
    val df2 = Seq((3L, "c")).toDF("id", "v")
    df2.write.mode("overwrite").saveAsTable("graft_test.sink_check")
    val back = spark.table("graft_test.sink_check").collect()
    assert(back.map(_.getLong(0)).toSeq == Seq(3L))
    spark.sql("DROP TABLE graft_test.sink_check")
    spark.sql("DROP SCHEMA graft_test")
  }

  test("temp view registration, SQL access, drop") {
    import spark.implicits._
    val df = Seq((1, "x")).toDF("id", "v").cache()
    df.createOrReplaceTempView("tv_check")
    assert(spark.sql("SELECT v FROM tv_check WHERE id = 1").first().getString(0) == "x")
    assert(spark.catalog.tableExists("tv_check"))
    spark.catalog.dropTempView("tv_check")
    assert(!spark.catalog.tableExists("tv_check"))
    df.unpersist()
  }

  test("actions: count / collect / first on a parquet-backed table") {
    val nation = Tables.nation(spark, "/root/testdata/sf0.001")
    assert(nation.count() == 25)
    assert(nation.collect().length == 25)
    assert(nation.select(min(col("n_nationkey"))).first().getInt(0) == 0)
  }
}
