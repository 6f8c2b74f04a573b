package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.governance._

/** q54: the governance validation path (tag parsing → medallion gate →
  * per-field checks → remediation SQL) driven end-to-end through the
  * driver's hash-checked oracle gate — previously the one component
  * family certified only by ScalaTest golden files.
  *
  * The information_schema stand-in is derived from the `nation`
  * parquet: each of its 25 rows becomes one "table" whose governance
  * tags are pure functions of `n_nationkey`, chosen to hit every gate
  * and check arm (missing vs invalid medallion, valid/invalid/missing
  * codelist values per tier, column geometry check incl. the skipped
  * no-epsg column). The oracle replays the full matrix in SQL —
  * which tier runs which checks, which values pass which codelists —
  * and rebuilds the remediation SQL strings (ALTER TABLE … SET TAGS /
  * COMMENT ON TABLE / SET TBLPROPERTIES templates,
  * `governance/checks/table.py:17-46`, `checks/column.py:10-36`)
  * character-for-character.
  *
  * Validation itself is driver-side over collected rows, mirroring the
  * reference facade (`governance/main.py:26-45`): catalog metadata is
  * bounded (thousands of tables), never corpus-scale, so a driver loop
  * is the honest shape — the DataFrame is the findings report.
  */
object GovernanceQueries {

  /** Deterministic fixture codelists for the two registries the
    * reference fetches over HTTP (ids replayed in the oracle). */
  private val provider = new FixtureCodelistProvider(Map(
    Codelists.Urls.hovedkategori -> Seq(
      CodelistEntry("samfunn", "Samfunn"),
      CodelistEntry("basis-geodata", "Basis geodata")),
    Codelists.Urls.begrep -> Seq(
      CodelistEntry("naturmiljo", "Naturmiljo"))))

  private val ValidSikkerhet =
    "https://register.geonorge.no/metadata-kodelister/sikkerhetsnivaa/unclassified"
  private val ValidTilgang =
    "http://publications.europa.eu/resource/authority/access-right/PUBLIC"

  /** Governance tags of stand-in table `k` — every arm of the check
    * matrix is reachable: k%5 picks the medallion (incl. missing and
    * invalid), k%2 / k%3 / k%4 drive per-field presence/validity. */
  private def metadataFor(k: Int, name: String): TableMetadata =
    TableMetadata(
      catalog = Some("main"), schema = Some("gov"), table = Some(name),
      tittel = if (k % 2 == 0) Some(name) else None,
      beskrivelse = if (k % 3 == 0) None else Some(s"beskrivelse av $name"),
      tilgangsnivaa = if (k % 2 == 0) Some(ValidTilgang) else None,
      medaljongnivaa = (k % 5) match {
        case 0 => Some("bronze")
        case 1 => Some("silver")
        case 2 => Some("gold")
        case 3 => None               // gate: missing
        case _ => Some("platinum")   // gate: invalid
      },
      hovedkategori = if (k % 2 == 1) Some("samfunn") else None,
      emneord = if (k % 4 == 0) None else Some("kartdata"),
      begrep = if (k % 3 == 1) Some("naturmiljo") else None,
      sikkerhetsnivaa = (k % 3) match {
        case 0 => Some(ValidSikkerhet) // valid codelist id
        case 1 => Some("hemmelig")     // invalid → "er ugyldig"
        case _ => None                 // missing → "mangler"
      },
      columnProperties = Map(
        "geom" -> Map("epsg" -> "4326",
          "geometri_encoding" -> (if (k % 2 == 0) "WKB" else "hexwkb")),
        "navn" -> Map("beskrivelse" -> "ingen epsg her"))) // no epsg → skipped

  def q54Governance(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val checks = new Checks(provider)
    val findings = graft.Tables.nation(s, dir)
      .select("n_nationkey", "n_name").collect()
      .flatMap { r =>
        val k = r.getInt(0)
        val name = r.getString(1)
        checks.validateTable(metadataFor(k, name)).map { e =>
          val reason = if (e.description.contains("mangler")) "mangler" else "ugyldig"
          (name, e.forField, e.column, reason, e.solution)
        }
      }.toSeq
    findings.toDF("tbl", "for_field", "column_name", "reason", "solution")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q54_governance" -> q54Governance _,
  )

  // The oracle re-derives the full validation matrix: the medallion
  // gate short-circuits the tier checks; each tier's field list and
  // each field's pass condition (presence / embedded-codelist id /
  // fixture-registry id / geometry encoding codevalue) is replayed as
  // a WHERE clause, and the remediation SQL is rebuilt by template.
  private val q54Sql =
    """WITH medal AS (SELECT n_nationkey AS k, n_name AS t, n_nationkey % 5 AS m
      |  FROM nation),
      |errs AS (
      |  SELECT t, 'medaljongnivaa' AS for_field, CAST(NULL AS VARCHAR) AS column_name,
      |    CASE WHEN m = 3 THEN 'mangler' ELSE 'ugyldig' END AS reason
      |  FROM medal WHERE m IN (3, 4)
      |  UNION ALL
      |  SELECT t, 'tittel', NULL, 'mangler'
      |  FROM medal WHERE m IN (0, 1, 2) AND k % 2 = 1
      |  UNION ALL
      |  SELECT t, 'beskrivelse', NULL, 'mangler'
      |  FROM medal WHERE m IN (0, 1, 2) AND k % 3 = 0
      |  UNION ALL
      |  SELECT t, 'emneord', NULL, 'mangler'
      |  FROM medal WHERE m IN (1, 2) AND k % 4 = 0
      |  UNION ALL
      |  SELECT t, 'sikkerhetsnivaa', NULL,
      |    CASE WHEN k % 3 = 1 THEN 'ugyldig' ELSE 'mangler' END
      |  FROM medal WHERE m IN (0, 1, 2) AND k % 3 <> 0
      |  UNION ALL
      |  SELECT t, 'begrep', NULL, 'mangler'
      |  FROM medal WHERE m IN (1, 2) AND k % 3 <> 1
      |  UNION ALL
      |  SELECT t, 'hovedkategori', NULL, 'mangler'
      |  FROM medal WHERE m = 2 AND k % 2 = 0
      |  UNION ALL
      |  SELECT t, 'tilgangsnivaa', NULL, 'mangler'
      |  FROM medal WHERE m = 2 AND k % 2 = 1
      |  UNION ALL
      |  SELECT t, 'geometri_encoding', 'geom', 'mangler'
      |  FROM medal WHERE m = 2 AND k % 2 = 1
      |)
      |SELECT t AS tbl, for_field, column_name, reason,
      |  CASE WHEN for_field = 'beskrivelse'
      |    THEN 'COMMENT ON TABLE main.gov.' || t || ' IS ''<<SETT_BESKRIVELSE_HER>>'''
      |  WHEN for_field = 'geometri_encoding'
      |    THEN 'ALTER TABLE main.gov.' || t ||
      |      ' SET TBLPROPERTIES ( ''columns.geom.geometri_encoding'' = ''<<SETT_ROMLIG_REPRESENTASJONSTYPE_HER>>'')'
      |  ELSE 'ALTER TABLE main.gov.' || t || ' SET TAGS ( ''' || for_field ||
      |    ''' = ''<<SETT_' || upper(for_field) || '_HER>>'')'
      |  END AS solution
      |FROM errs""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q54_governance" -> q54Sql,
  )
}
