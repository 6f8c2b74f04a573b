package graft.governance

/** Data model for table-metadata governance — the engine's equivalent
  * of the reference's `governance/checks/common.py:18-68`.
  */

/** One codelist value. Equality against plain strings matches on `id`
  * (reference `common.py:23-28`). */
final case class CodelistEntry(id: String, label: String) {
  def matches(value: String): Boolean = value == id
}

/** Permissive record of a table's governance tags: known fields plus a
  * catch-all for unknown tags; `delta.*` keys are silently dropped
  * (reference `common.py:31-56`). */
final case class TableMetadata(
    catalog: Option[String] = None,
    schema: Option[String] = None,
    table: Option[String] = None,
    tittel: Option[String] = None,
    beskrivelse: Option[String] = None,
    tilgangsnivaa: Option[String] = None,
    medaljongnivaa: Option[String] = None,
    hovedkategori: Option[String] = None,
    emneord: Option[String] = None,
    epsgKoder: Option[String] = None,
    begrep: Option[String] = None,
    sikkerhetsnivaa: Option[String] = None,
    columnProperties: Map[String, Map[String, String]] = Map.empty,
    optionalParams: Map[String, String] = Map.empty)

object TableMetadata {
  val KnownFields: Set[String] = Set(
    "catalog", "schema", "table", "tittel", "beskrivelse", "tilgangsnivaa",
    "medaljongnivaa", "hovedkategori", "emneord", "epsg_koder", "begrep",
    "sikkerhetsnivaa", "column_properties")

  /** Build from a tag map: known keys populate fields, `delta.*` keys
    * are dropped, the rest land in `optionalParams`
    * (`common.py:49-56`). */
  def fromMap(kv: Map[String, String],
      columnProperties: Map[String, Map[String, String]] = Map.empty): TableMetadata =
    TableMetadata(
      catalog = kv.get("catalog"),
      schema = kv.get("schema"),
      table = kv.get("table"),
      tittel = kv.get("tittel"),
      beskrivelse = kv.get("beskrivelse"),
      tilgangsnivaa = kv.get("tilgangsnivaa"),
      medaljongnivaa = kv.get("medaljongnivaa"),
      hovedkategori = kv.get("hovedkategori"),
      emneord = kv.get("emneord"),
      epsgKoder = kv.get("epsg_koder"),
      begrep = kv.get("begrep"),
      sikkerhetsnivaa = kv.get("sikkerhetsnivaa"),
      columnProperties = columnProperties,
      optionalParams = kv.view
        .filterKeys(k => !KnownFields.contains(k) && !k.contains("delta."))
        .toMap)
}

/** One validation finding, including the remediation SQL the platform
  * surfaces to users (reference `common.py:59-68`). `validValues` is
  * either a type description or the concrete codelist
  * (`str | List[CodelistEntry]` in the reference). */
final case class MetadataError(
    catalog: Option[String],
    schema: Option[String],
    table: Option[String],
    column: Option[String],
    description: String,
    solution: Option[String],
    forField: String,
    validValues: Either[String, Seq[CodelistEntry]])
