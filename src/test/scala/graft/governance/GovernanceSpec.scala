package graft.governance

import org.scalatest.funsuite.AnyFunSuite

/** Golden-fixture governance tests mirroring the reference's unit
  * suite (`tests/test_table_validation.py:16-60`) plus negative cases
  * per check. The gold fixture is `example_table_metadata_gold.json`
  * ported verbatim (FIXTURES.md §3).
  */
class GovernanceSpec extends AnyFunSuite {

  private val goldTags: Map[String, String] = Map(
    "catalog" -> "catalog",
    "schema" -> "schema",
    "table" -> "table",
    "tittel" -> "tittel",
    "beskrivelse" -> "beskrivelse",
    "tilgangsnivaa" -> "http://publications.europa.eu/resource/authority/access-right/PUBLIC",
    "medaljongnivaa" -> "gold",
    "hovedkategori" -> "https://register.geonorge.no/metadata-kodelister/tematisk-hovedkategori/farming",
    "begrep" -> "https://register.geonorge.no/metadata-kodelister/nasjonal-temainndeling/Samfunnssikkerhet",
    "epsg_koder" -> "25835",
    "emneord" -> "bruksomraade",
    "sikkerhetsnivaa" -> "https://register.geonorge.no/metadata-kodelister/sikkerhetsnivaa/unclassified_sensitive",
  )
  private val goldColumns = Map("geometri" -> Map("epsg" -> "25835", "geometri_encoding" -> "wkt"))

  private val provider = new FixtureCodelistProvider(Map(
    Codelists.Urls.hovedkategori -> Seq(
      CodelistEntry("https://register.geonorge.no/metadata-kodelister/tematisk-hovedkategori/farming", "Farming"),
      CodelistEntry("https://register.geonorge.no/metadata-kodelister/tematisk-hovedkategori/oceans", "Oceans")),
    Codelists.Urls.begrep -> Seq(
      CodelistEntry("https://register.geonorge.no/metadata-kodelister/nasjonal-temainndeling/Samfunnssikkerhet", "Samfunnssikkerhet"),
      CodelistEntry("https://register.geonorge.no/metadata-kodelister/nasjonal-temainndeling/Basisdata", "Basisdata")),
  ))
  private val checks = new Checks(provider)

  private def gold(without: String = "", extra: Map[String, String] = Map.empty) =
    TableMetadata.fromMap(goldTags - without ++ extra, goldColumns)

  test("gold fixture validates to zero errors (test_table_validation.py:31-43)") {
    assert(checks.validateTable(gold()) == Nil)
  }

  test("extra optional fields are tolerated and captured (ref :45-60)") {
    val m = gold(extra = Map("optional" -> "value"))
    assert(checks.validateTable(m) == Nil)
    assert(m.optionalParams == Map("optional" -> "value"))
  }

  test("delta.* tags never reach optionalParams (common.py:55)") {
    val m = gold(extra = Map("delta.minReaderVersion" -> "2"))
    assert(m.optionalParams.isEmpty)
    assert(checks.validateTable(m) == Nil)
  }

  test("invalid/missing medaljongnivaa short-circuits to the single gate error") {
    val missing = checks.validateTable(gold(without = "medaljongnivaa"))
    assert(missing.map(_.forField) == List("medaljongnivaa"))
    assert(missing.head.description.contains("mangler"))
    val invalid = checks.validateTable(gold(extra = Map("medaljongnivaa" -> "platinum")))
    assert(invalid.map(_.forField) == List("medaljongnivaa"))
    assert(invalid.head.description.contains("er ugyldig"))
  }

  test("each removed gold field yields exactly its one error with remediation SQL") {
    val expectedSolutions = Map(
      "tittel" -> "ALTER TABLE catalog.schema.table SET TAGS ( 'tittel' = '<<SETT_TITTEL_HER>>')",
      "beskrivelse" -> "COMMENT ON TABLE catalog.schema.table IS '<<SETT_BESKRIVELSE_HER>>'",
      "hovedkategori" -> "ALTER TABLE catalog.schema.table SET TAGS ( 'hovedkategori' = '<<SETT_HOVEDKATEGORI_HER>>')",
      "emneord" -> "ALTER TABLE catalog.schema.table SET TAGS ( 'emneord' = '<<SETT_EMNEORD_HER>>')",
      "begrep" -> "ALTER TABLE catalog.schema.table SET TAGS ( 'begrep' = '<<SETT_BEGREP_HER>>')",
      "tilgangsnivaa" -> "ALTER TABLE catalog.schema.table SET TAGS ( 'tilgangsnivaa' = '<<SETT_TILGANGSNIVAA_HER>>')",
      "sikkerhetsnivaa" -> "ALTER TABLE catalog.schema.table SET TAGS ( 'sikkerhetsnivaa' = '<<SETT_SIKKERHETSNIVAA_HER>>')",
    )
    expectedSolutions.foreach { case (field, solution) =>
      val errs = checks.validateTable(gold(without = field))
      assert(errs.map(_.forField) == List(field), s"field $field")
      assert(errs.head.solution.contains(solution), s"field $field")
      assert(errs.head.description.startsWith(s"🔴 Feil: '$field' mangler"), s"field $field")
    }
  }

  test("remediation SQL is locale-independent (Turkish-I trap)") {
    // default-locale toUpperCase under tr_TR turns 'tittel' into
    // 'TİTTEL' (dotted capital I), silently changing the remediation
    // placeholder; generateError must pin Locale.ROOT.
    // JVM-global flip is safe here because Test/fork is on and sbt
    // runs forked suites sequentially (testForkedParallel defaults to
    // false) — revisit if that flag is ever enabled.
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(new java.util.Locale("tr", "TR"))
      val errs = checks.validateTable(gold(without = "tittel"))
      assert(errs.map(_.forField) == List("tittel"))
      assert(errs.head.solution.exists(_.contains("<<SETT_TITTEL_HER>>")),
        s"locale-dependent uppercase leaked: ${errs.head.solution}")
    } finally java.util.Locale.setDefault(prev)
  }

  test("invalid codelist values are 'er ugyldig', not 'mangler'") {
    val errs = checks.validateTable(
      gold(extra = Map("sikkerhetsnivaa" -> "classified")))
    assert(errs.map(_.forField) == List("sikkerhetsnivaa"))
    assert(errs.head.description.contains("er ugyldig"))
  }

  test("geometri_encoding: epsg column without valid encoding errors (column.py:10-36)") {
    val bad = TableMetadata.fromMap(goldTags,
      Map("geometri" -> Map("epsg" -> "25835", "geometri_encoding" -> "kml")))
    val errs = checks.validateTable(bad)
    assert(errs.map(_.forField) == List("geometri_encoding"))
    assert(errs.head.column.contains("geometri"))
    assert(errs.head.solution.contains(
      "ALTER TABLE catalog.schema.table SET TBLPROPERTIES ( " +
        "'columns.geometri.geometri_encoding' = '<<SETT_ROMLIG_REPRESENTASJONSTYPE_HER>>')"))
  }

  test("geometri_encoding is case-insensitive; columns without epsg are skipped") {
    val mixed = TableMetadata.fromMap(goldTags, Map(
      "geometri" -> Map("epsg" -> "25835", "geometri_encoding" -> "WKB"),
      "plain_text" -> Map("some_prop" -> "x")))
    assert(checks.validateTable(mixed) == Nil)
  }

  test("bronze requires only tittel/beskrivelse/sikkerhetsnivaa (table.py:214-233)") {
    val bronzeMin = TableMetadata.fromMap(Map(
      "catalog" -> "c", "schema" -> "s", "table" -> "t",
      "medaljongnivaa" -> "bronze", "tittel" -> "t", "beskrivelse" -> "b",
      "sikkerhetsnivaa" -> Codelists.sikkerhetsnivaa.head.id))
    assert(checks.validateTable(bronzeMin) == Nil)
    // the same metadata fails silver (emneord + begrep now required)
    val silver = checks.validateTable(TableMetadata.fromMap(Map(
      "catalog" -> "c", "schema" -> "s", "table" -> "t",
      "medaljongnivaa" -> "silver", "tittel" -> "t", "beskrivelse" -> "b",
      "sikkerhetsnivaa" -> Codelists.sikkerhetsnivaa.head.id)))
    assert(silver.map(_.forField).toSet == Set("emneord", "begrep"))
  }

  test("mandatoryMetadataFor lists a tier's required fields (table.py:248-260)") {
    val gold = checks.mandatoryMetadataFor("gold")
    assert(gold.keySet == Set("tittel", "beskrivelse", "hovedkategori", "emneord",
      "begrep", "tilgangsnivaa", "sikkerhetsnivaa"))
    val bronze = checks.mandatoryMetadataFor("bronze")
    assert(bronze.keySet == Set("tittel", "beskrivelse", "sikkerhetsnivaa"))
  }

  test("Codelists.get resolves every reference key (common.py:173-185)") {
    assert(Codelists.get("tilgangsnivaa", provider).get.size == 3)
    assert(Codelists.get("sikkerhetsnivaa", provider).get.size == 2)
    assert(Codelists.get("medaljongnivaa", provider).get.map(_.id) ==
      Seq("bronze", "silver", "gold"))
    assert(Codelists.get("hovedkategori", provider).get.exists(_.id.endsWith("/farming")))
    assert(Codelists.get("begrep", provider).get.size == 2)
    assert(Codelists.get("nonsense", provider).isEmpty)
  }

  test("Metadata facade: tags + comment through an injected source (main.py:13-45)") {
    val src = new TableInfoSource {
      def tableTags(c: String, s: String, t: String): Seq[(String, String)] =
        (goldTags - "beskrivelse" - "catalog" - "schema" - "table").toSeq :+
          ("delta.minReaderVersion" -> "2")
      def tableComment(c: String, s: String, t: String): Option[String] =
        Some("beskrivelse")
    }
    val meta = new Metadata("catalog", "schema", "table", src, provider)
    val m = meta.getTableMetadata
    assert(m.beskrivelse.contains("beskrivelse"))
    assert(m.catalog.contains("catalog"))
    // gold column properties aren't in table_tags; validate sans geometry
    assert(new Checks(provider).validateTable(m) == Nil)
  }
}
