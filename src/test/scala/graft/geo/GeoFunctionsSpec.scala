package graft.geo

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** End-to-end SQL surface tests mirroring the reference's notebook
  * assertions (`udfs/tests/wkb_registration_and_sql_tests.py`):
  * registration visible in listFunctions, SQL invocation over a temp
  * view, exact type strings, and both interpreted and codegen'd
  * evaluation paths of the Catalyst expression.
  */
class GeoFunctionsSpec extends AnyFunSuite with SparkTestSession {

  private def corpusView(name: String): Unit = {
    val schema = StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("wkb_hex", StringType),
      StructField("wkb_bytes", BinaryType)))
    val rows = WkbCorpus.cases.map { case (n, h, _) =>
      Row(n, h, Wkb.fromHex(h).get)
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      schema).createOrReplaceTempView(name)
  }

  test("registerAll makes both functions visible in listFunctions") {
    GeoFunctions.registerAll(spark)
    val names = spark.catalog.listFunctions().collect().map(_.name).toSet
    assert(names.contains("get_wkb_geom_type"))
    assert(names.contains("curved_to_linear_wkb"))
  }

  test("SQL over binary and hex columns returns the reference strings") {
    GeoFunctions.registerAll(spark)
    corpusView("wkb_test_data")
    val got = spark.sql(
      """SELECT name, get_wkb_geom_type(wkb_bytes) AS t_bin,
        |       get_wkb_geom_type(wkb_hex) AS t_hex
        |FROM wkb_test_data""".stripMargin)
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    WkbCorpus.cases.foreach { case (n, _, expected) =>
      assert(got(n) == ((expected, expected)), s"case $n")
    }
    spark.catalog.dropTempView("wkb_test_data")
  }

  test("null input maps to the diagnostic, not SQL NULL") {
    GeoFunctions.registerAll(spark)
    val r = spark.sql("SELECT get_wkb_geom_type(CAST(NULL AS BINARY))").collect()(0)
    assert(r.getString(0) == "Invalid (null input)")
  }

  test("interpreted and codegen paths agree (factoryMode sweep)") {
    GeoFunctions.registerAll(spark)
    corpusView("wkb_codegen_data")
    val modes = Seq("NO_CODEGEN", "CODEGEN_ONLY")
    val results = modes.map { mode =>
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try spark.sql(
        "SELECT name, get_wkb_geom_type(wkb_bytes) FROM wkb_codegen_data ORDER BY name")
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(results(0) == results(1))
    assert(results(0).nonEmpty)
    spark.catalog.dropTempView("wkb_codegen_data")
  }

  test("curved_to_linear_wkb from SQL converts CurvePolygon to Polygon") {
    GeoFunctions.registerAll(spark)
    corpusView("wkb_lin_data")
    val r = spark.sql(
      """SELECT get_wkb_geom_type(curved_to_linear_wkb(wkb_bytes, 5.0D)) AS t
        |FROM wkb_lin_data WHERE name = 'curvepolygon_2d'""".stripMargin).collect()
    assert(r.map(_.getString(0)).toSeq == Seq("Polygon"))
    spark.catalog.dropTempView("wkb_lin_data")
  }

  test("Column API geomType routes through the registered function") {
    GeoFunctions.registerAll(spark)
    corpusView("wkb_colapi_data")
    val got = spark.table("wkb_colapi_data")
      .select(org.apache.spark.sql.functions.col("name"),
        graft.geo.expressions.WkbGeomTypeExpr.geomTypeOf("wkb_bytes").as("t"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    WkbCorpus.cases.foreach { case (n, _, expected) =>
      assert(got(n) == expected, s"case $n")
    }
    spark.catalog.dropTempView("wkb_colapi_data")
  }

  test("wrong arity is an analysis error") {
    GeoFunctions.registerAll(spark)
    intercept[Exception] {
      spark.sql("SELECT get_wkb_geom_type()").collect()
    }
  }
}
