package graft.governance

/** Per-field governance checks + the medallion-tier check matrix —
  * reference `governance/checks/table.py:17-260` and
  * `checks/column.py:5-36`, with remote codelists injected via
  * [[CodelistProvider]].
  *
  * Error strings (description prefix, remediation SQL) reproduce the
  * reference templates exactly; the valid-values suffix renders the
  * entry ids rather than Python dataclass reprs.
  */
final class Checks(provider: CodelistProvider) {

  type Check = (TableMetadata, List[MetadataError]) => List[MetadataError]

  /** `table.py:17-46` — description + remediation-SQL template. */
  private def generateError(m: TableMetadata, field: String, tpe: String,
      isMissing: Boolean, validValuesDescription: Option[String] = None,
      validValues: Either[String, Seq[CodelistEntry]] = Left("string")): MetadataError = {
    val reason = if (isMissing) "mangler" else "er ugyldig"
    val description =
      s"🔴 Feil: '$field' $reason i table properties. Type: <$tpe>" +
        validValuesDescription.map(d => s" - $d").getOrElse("")
    val catalog = m.catalog.getOrElse("")
    val schema = m.schema.getOrElse("")
    val table = m.table.getOrElse("")
    // Locale.ROOT: default-locale toUpperCase turns the 'i' in tittel/
    // tilgangsnivaa/... into a dotted İ under a Turkish JVM locale,
    // silently changing the remediation SQL (and diverging from the
    // reference's locale-independent Python str.upper())
    val fieldUpper = field.toUpperCase(java.util.Locale.ROOT)
    val solution =
      if (field == "beskrivelse")
        s"COMMENT ON TABLE $catalog.$schema.$table IS '<<SETT_${fieldUpper}_HER>>'"
      else
        s"ALTER TABLE $catalog.$schema.$table SET TAGS ( '$field' = '<<SETT_${fieldUpper}_HER>>')"
    MetadataError(m.catalog, m.schema, m.table, None, description, Some(solution),
      field, validValues)
  }

  /** `common.py:130-146`: null → false; explicit allow-list →
    * membership; no list and no URL → non-null; else fetch remote →
    * membership (string matches entry id). */
  def checkCodelistValue(kodelisteUrl: Option[String], value: Option[String],
      allowedValues: Option[Seq[CodelistEntry]] = None): Boolean =
    value match {
      case None => false
      case Some(v) =>
        allowedValues match {
          case Some(entries) => entries.exists(_.matches(v))
          case None =>
            kodelisteUrl match {
              case None      => true
              case Some(url) => provider.fetch(url).exists(_.matches(v))
            }
        }
    }

  private def entriesDescription(entries: Seq[CodelistEntry]): String =
    s"gyldige verdier: ${entries.map(_.id).mkString("[", ", ", "]")}"

  val checkTittel: Check = (m, ctx) =>
    if (!checkCodelistValue(None, m.tittel)) ctx :+
      generateError(m, "tittel", "string", m.tittel.isEmpty)
    else ctx

  val checkBeskrivelse: Check = (m, ctx) =>
    if (!checkCodelistValue(None, m.beskrivelse)) ctx :+
      generateError(m, "beskrivelse", "string", m.beskrivelse.isEmpty)
    else ctx

  val checkEmneord: Check = (m, ctx) =>
    if (!checkCodelistValue(None, m.emneord)) ctx :+
      generateError(m, "emneord", "string", m.emneord.isEmpty)
    else ctx

  val checkTilgangsnivaa: Check = (m, ctx) =>
    if (!checkCodelistValue(None, m.tilgangsnivaa, Some(Codelists.tilgangsnivaa))) ctx :+
      generateError(m, "tilgangsnivaa", "tilgangsrestriksjoner", m.tilgangsnivaa.isEmpty,
        Some(entriesDescription(Codelists.tilgangsnivaa)), Right(Codelists.tilgangsnivaa))
    else ctx

  val checkSikkerhetsnivaa: Check = (m, ctx) =>
    if (!checkCodelistValue(None, m.sikkerhetsnivaa, Some(Codelists.sikkerhetsnivaa))) ctx :+
      generateError(m, "sikkerhetsnivaa", "sikkerhetsniva", m.sikkerhetsnivaa.isEmpty,
        Some(entriesDescription(Codelists.sikkerhetsnivaa)), Right(Codelists.sikkerhetsnivaa))
    else ctx

  val checkMedaljongnivaa: Check = (m, ctx) => {
    val valid = Codelists.medaljongnivaa.map(v => CodelistEntry(v, v))
    if (!checkCodelistValue(None, m.medaljongnivaa, Some(valid))) ctx :+
      generateError(m, "medaljongnivaa", "valør", m.medaljongnivaa.isEmpty,
        Some(s"gyldige verdier: ${Codelists.medaljongnivaa.mkString("[", ", ", "]")}"),
        Right(valid))
    else ctx
  }

  val checkHovedkategori: Check = (m, ctx) =>
    if (!checkCodelistValue(Some(Codelists.Urls.hovedkategori), m.hovedkategori)) {
      val valid = provider.fetch(Codelists.Urls.hovedkategori)
      ctx :+ generateError(m, "hovedkategori", "tematisk-hovedkategori",
        m.hovedkategori.isEmpty, Some(entriesDescription(valid)), Right(valid))
    } else ctx

  val checkBegrep: Check = (m, ctx) =>
    if (!checkCodelistValue(Some(Codelists.Urls.begrep), m.begrep)) {
      val valid = provider.fetch(Codelists.Urls.begrep)
      ctx :+ generateError(m, "begrep", "nasjonal-temainndeling",
        m.begrep.isEmpty, Some(entriesDescription(valid)), Right(valid))
    } else ctx

  /** `checks/column.py:10-36`: every column declaring `epsg` must have
    * a `geometri_encoding` from the codelist (case-insensitive). */
  val checkGeometriEncoding: Check = (m, ctx) =>
    m.columnProperties.toSeq.sortBy(_._1).foldLeft(ctx) { case (acc, (colName, props)) =>
      val epsg = props.get("epsg")
      val enc = props.getOrElse("geometri_encoding", "")
      if (epsg.isEmpty) acc
      else if (Codelists.geometriEncodingCodevalues.contains(enc.toLowerCase(java.util.Locale.ROOT))) acc
      else acc :+ MetadataError(
        m.catalog, m.schema, m.table, Some(colName),
        "🔴 Feil: 'geometri_encoding' mangler i column properties. Type: " +
          "<geometri_encoding> - gyldige verdier er WKT, WKB, GeoJson eller S2cell ",
        Some(s"ALTER TABLE ${m.catalog.getOrElse("")}.${m.schema.getOrElse("")}." +
          s"${m.table.getOrElse("")} SET TBLPROPERTIES ( 'columns.$colName" +
          ".geometri_encoding' = '<<SETT_ROMLIG_REPRESENTASJONSTYPE_HER>>')"),
        "geometri_encoding",
        Left(Codelists.geometriEncodingCodevalues.mkString(", ")))
    }

  /** Medallion matrix — bronze ⊂ silver ⊂ gold; gold adds the column
    * geometry check (`table.py:214-233`). */
  val checksForValor: Map[String, Seq[Check]] = Map(
    "bronze" -> Seq(checkTittel, checkBeskrivelse, checkSikkerhetsnivaa),
    "silver" -> Seq(checkTittel, checkBeskrivelse, checkEmneord, checkBegrep,
      checkSikkerhetsnivaa),
    "gold" -> Seq(checkTittel, checkBeskrivelse, checkHovedkategori, checkEmneord,
      checkBegrep, checkTilgangsnivaa, checkSikkerhetsnivaa, checkGeometriEncoding),
  )

  /** Gate on a valid medallion tier, then run that tier's checks
    * (`table.py:236-245`). */
  def validateTable(m: TableMetadata): List[MetadataError] = {
    val gate = checkMedaljongnivaa(m, Nil)
    if (gate.nonEmpty) gate
    else checksForValor(m.medaljongnivaa.get).foldLeft(List.empty[MetadataError]) {
      (ctx, check) => check(m, ctx)
    }
  }

  /** Required fields for a tier: run each check against empty metadata
    * and keep the resulting error templates (`table.py:248-260`). */
  def mandatoryMetadataFor(medaljongnivaa: String,
      columnProperties: Map[String, Map[String, String]] = Map.empty): Map[String, MetadataError] =
    checksForValor(medaljongnivaa).foldLeft(Map.empty[String, MetadataError]) { (acc, check) =>
      check(TableMetadata(columnProperties = columnProperties), Nil) match {
        case err :: _ => acc + (err.forField -> err)
        case Nil      => acc
      }
    }
}
