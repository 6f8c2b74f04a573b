package graft.governance

import org.apache.spark.sql.SparkSession

/** Catalog metadata access for governance validation — reference
  * `governance/main.py:7-68`. The information_schema queries sit
  * behind [[TableInfoSource]] so tests and air-gapped runs inject
  * fixture-backed sources instead of a live catalog.
  */
trait TableInfoSource {
  /** (tag_name, tag_value) rows for the table
    * (`main.py:17-19` query shape). */
  def tableTags(catalog: String, schema: String, table: String): Seq[(String, String)]

  /** The table comment (`main.py:20-22`). */
  def tableComment(catalog: String, schema: String, table: String): Option[String]
}

/** Live source: the same two information_schema queries as the
  * reference, via spark.sql. */
final class SparkInfoSchemaSource(spark: SparkSession) extends TableInfoSource {
  def tableTags(catalog: String, schema: String, table: String): Seq[(String, String)] =
    spark.sql(
      s"""SELECT catalog_name, schema_name, table_name, tag_name, tag_value
         |FROM system.information_schema.table_tags
         |WHERE catalog_name = '$catalog' AND schema_name = '$schema'
         |  AND table_name = '$table'""".stripMargin)
      .collect().map(r => (r.getAs[String]("tag_name"), r.getAs[String]("tag_value"))).toSeq

  def tableComment(catalog: String, schema: String, table: String): Option[String] =
    spark.sql(
      s"""SELECT comment FROM system.information_schema.tables
         |WHERE table_catalog = '$catalog' AND table_schema = '$schema'
         |  AND table_name = '$table'""".stripMargin)
      .collect().headOption.map(_.getAs[String]("comment"))
}

/** Facade: read tags + comment → TableMetadata → validate
  * (`main.py:13-45,65-68`). */
final class Metadata(catalog: String, schema: String, table: String,
    source: TableInfoSource, provider: CodelistProvider) {

  /** Column metadata joined with column tags — the reference's only
    * dataflow join (`main.py:47-63`): a 4-key LEFT OUTER equi-join of
    * information_schema.columns with column_tags, unmatched columns
    * surviving with null tags. `infoSchema` is overridable so offline
    * tests (and non-Unity catalogs) can point it at view-backed
    * stand-ins; the default is the reference's catalog path. */
  def getTableColumnMetadata(spark: SparkSession,
      infoSchema: String = "system.information_schema"): org.apache.spark.sql.DataFrame =
    spark.sql(
      s"""SELECT C.*, CT.*
         |FROM $infoSchema.columns AS C
         |LEFT JOIN $infoSchema.column_tags AS CT
         |ON C.table_catalog = CT.catalog_name
         |  AND C.table_schema = CT.schema_name
         |  AND C.table_name = CT.table_name
         |  AND C.column_name = CT.column_name
         |WHERE C.table_catalog = '$catalog'
         |  AND C.table_schema = '$schema'
         |  AND C.table_name = '$table'""".stripMargin)

  def getTableMetadata: TableMetadata = {
    val keys = source.tableTags(catalog, schema, table)
      .filterNot { case (name, _) => name.contains("delta.") } // delta.* dropped, main.py:27-28
      .toMap
    TableMetadata(
      catalog = Some(catalog),
      schema = Some(schema),
      table = Some(table),
      tittel = keys.get("tittel"),
      beskrivelse = source.tableComment(catalog, schema, table),
      tilgangsnivaa = keys.get("tilgangsnivaa"),
      medaljongnivaa = keys.get("medaljongnivaa"),
      hovedkategori = keys.get("hovedkategori"),
      emneord = keys.get("emneord"),
      epsgKoder = keys.get("epsg_koder"),
      sikkerhetsnivaa = keys.get("sikkerhetsnivaa"),
      begrep = keys.get("begrep"))
  }

  def validate(): List[MetadataError] =
    new Checks(provider).validateTable(getTableMetadata)
}
