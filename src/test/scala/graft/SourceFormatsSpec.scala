package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink format coverage beyond parquet: the engine's tables
  * round-trip through ORC, JSON-lines, and CSV with identical
  * contents, and the JSON reader composes with the Json2Spark schema
  * compiler (schema-first ingestion, the reference's §1.4 pattern
  * applied to a file source).
  */
class SourceFormatsSpec extends AnyFunSuite with SparkTestSession {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private lazy val docs =
    Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "lang", "source", "n_chars") // text has newlines: CSV-hostile

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.orderBy("doc_id").collect().map(_.mkString("|")).toSeq

  test("ORC round-trip preserves contents and pushes filters") {
    val dir = tmp("graft-orc")
    docs.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(sortedRows(back) == sortedRows(docs))
    val plan = back.filter(col("n_chars") > 100).select("doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && !plan.contains("PushedFilters: []"),
      s"ORC scan lost filter pushdown:\n${plan.take(1200)}")
  }

  test("JSON-lines ingestion with a Json2Spark-compiled schema") {
    val dir = tmp("graft-json")
    docs.write.mode("overwrite").json(dir)
    // schema-first read: the JSON Schema compiler drives the source
    // schema, so field types are contractual, not inferred
    val schema = graft.schema.JsonSchemaToStruct.convert(
      """{"properties": {
        |  "doc_id": {"type": "integer"},
        |  "lang": {"type": "string"},
        |  "source": {"type": "string"},
        |  "n_chars": {"type": "integer"}}}""".stripMargin)
    val back = spark.read.schema(schema).json(dir)
      .select("doc_id", "lang", "source", "n_chars")
    assert(sortedRows(back) == sortedRows(docs))
  }

  test("CSV round-trip with header and explicit schema") {
    val dir = tmp("graft-csv")
    docs.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").schema(docs.schema).csv(dir)
    assert(sortedRows(back) == sortedRows(docs))
  }

  test("binaryFile source: a media DIRECTORY becomes the multimodal " +
      "frame — metadata columns, glob filter, real decode downstream") {
    val dir = tmp("graft-bin")
    // three real BMP payloads + one decoy the glob must exclude
    Seq(("a.bmp", 2, 2), ("b.bmp", 4, 2), ("c.bmp", 8, 8)).foreach {
      case (name, w, h) =>
        java.nio.file.Files.write(
          java.nio.file.Paths.get(dir, name),
          graft.llm.Multimodal.encodeBmp(w, h))
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "notes.txt"),
      "not an image".getBytes)
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.bmp").load(dir)
    // the production schema: path/modificationTime/length/content
    assert(bin.columns.toSet ===
      Set("path", "modificationTime", "length", "content"))
    assert(bin.count() === 3, "the glob must exclude the decoy")
    // content is the exact bytes on disk, so the REAL decoder works
    // directly on the source frame — the 100 TB media-lake entry path
    val decode = udf { (c: Array[Byte]) =>
      graft.llm.Multimodal.decodeBmp(c).map { case (w, h) => s"${w}x$h" }
        .getOrElse("bad")
    }
    val dims = bin
      .select(element_at(split(col("path"), "/"), -1).as("name"),
        decode(col("content")).as("dims"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(dims === Map("a.bmp" -> "2x2", "b.bmp" -> "4x2",
      "c.bmp" -> "8x8"))
  }

  test("parquet schema evolution: mergeSchema unions generations, " +
      "old rows read null for new columns") {
    import spark.implicits._
    val dir = tmp("graft-evo")
    // generation 1: (doc_id, lang); generation 2 adds quality_fp
    Seq((1L, "en"), (2L, "de")).toDF("doc_id", "lang")
      .write.parquet(dir + "/g=1")
    Seq((3L, "fr", 750000L), (4L, "en", 250000L))
      .toDF("doc_id", "lang", "quality_fp")
      .write.parquet(dir + "/g=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet === Set("doc_id", "lang", "quality_fp", "g"))
    val rows = merged.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), Option(r.get(r.fieldIndex("quality_fp")))))
    assert(rows.toSeq === Seq(
      (1L, None), (2L, None), (3L, Some(750000L)), (4L, Some(250000L))),
      "old-generation rows must surface the new column as null")
    // WITHOUT mergeSchema the schema comes from an arbitrary single
    // footer — whichever wins, it is never the union with g: reading
    // plain must NOT be relied on for evolved layouts (mergeSchema is
    // the contract)
    val unmerged = spark.read.parquet(dir)
    assert(unmerged.columns.toSet.subsetOf(
      Set("doc_id", "lang", "quality_fp", "g")))
  }
}
