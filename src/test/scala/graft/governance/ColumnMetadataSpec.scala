package graft.governance

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The governance column-metadata join (`main.py:47-63`) against
  * view-backed information_schema stand-ins: 4-key LEFT OUTER, nulls
  * surviving for untagged columns. */
class ColumnMetadataSpec extends AnyFunSuite with SparkTestSession {

  test("columns left-join column_tags on 4 keys; untagged columns survive") {
    spark.sql("CREATE SCHEMA IF NOT EXISTS info_schema_fixture")
    val colsSchema = StructType(Seq(
      StructField("table_catalog", StringType), StructField("table_schema", StringType),
      StructField("table_name", StringType), StructField("column_name", StringType),
      StructField("data_type", StringType)))
    val tagsSchema = StructType(Seq(
      StructField("catalog_name", StringType), StructField("schema_name", StringType),
      StructField("table_name", StringType), StructField("column_name", StringType),
      StructField("tag_name", StringType), StructField("tag_value", StringType)))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(Seq(
        Row("cat", "sch", "tbl", "geom", "BINARY"),
        Row("cat", "sch", "tbl", "name", "STRING"),
        Row("cat", "sch", "other", "x", "INT"))).asJava), colsSchema)
      .write.mode("overwrite").saveAsTable("info_schema_fixture.columns")
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(Seq(
        Row("cat", "sch", "tbl", "geom", "geometri_encoding", "wkb"))).asJava), tagsSchema)
      .write.mode("overwrite").saveAsTable("info_schema_fixture.column_tags")
    try {
      // fully qualified: spark.sql.types._ also exports a Metadata class
      val meta = new graft.governance.Metadata("cat", "sch", "tbl",
        source = null, provider = null)
      val df = meta.getTableColumnMetadata(spark, infoSchema = "info_schema_fixture")
      val rows = df.collect()
      assert(rows.length == 2) // only tbl's columns; 'other' filtered out
      // positional access: C.* is cols 0-4, CT.* is 5-10 (SELECT C.*, CT.*
      // duplicates column_name, same as the reference output)
      val byCol = rows.map(r => r.getString(3) -> r).toMap
      assert(byCol("geom").getString(9) == "geometri_encoding")
      assert(byCol("geom").getString(10) == "wkb")
      assert(byCol("name").getString(9) == null) // null survives the left join
    } finally {
      spark.sql("DROP TABLE IF EXISTS info_schema_fixture.columns")
      spark.sql("DROP TABLE IF EXISTS info_schema_fixture.column_tags")
      spark.sql("DROP SCHEMA IF EXISTS info_schema_fixture")
    }
  }
}
