package graft.governance

/** Embedded codelists + the remote-codelist access trait.
  *
  * The three platform codelists ship inside the library (reference
  * `governance/checks/{sikkerhetsnivaa,tilgangsnivaa,geometri_encoding}
  * _kodeliste.py`) — value ids and codevalues reproduced; the Geonorge
  * registry lists (hovedkategori, begrep) are fetched at check time
  * through [[CodelistProvider]] so offline tests inject fixtures
  * (reference fetches over HTTP from the driver,
  * `common.py:84-86` — a latency/failure cliff this design removes).
  */
object Codelists {

  val medaljongnivaa: Seq[String] = Seq("bronze", "silver", "gold")

  object Urls {
    val hovedkategori =
      "https://register.geonorge.no/metadata-kodelister/tematisk-hovedkategori"
    val begrep =
      "https://register.geonorge.no/metadata-kodelister/nasjonal-temainndeling"
  }

  /** `sikkerhetsnivaa_kodeliste.py:1-43` (ids are the checked values). */
  val sikkerhetsnivaa: Seq[CodelistEntry] = Seq(
    CodelistEntry(
      "https://register.geonorge.no/metadata-kodelister/sikkerhetsnivaa/unclassified",
      "Ugradert"),
    CodelistEntry(
      "https://register.geonorge.no/metadata-kodelister/sikkerhetsnivaa/unclassified_sensitive",
      "Ungradert skjermingsverdig"),
  )

  /** `tilgangsnivaa_kodeliste.py:1-57` (EU access-right URIs). */
  val tilgangsnivaa: Seq[CodelistEntry] = Seq(
    CodelistEntry(
      "http://publications.europa.eu/resource/authority/access-right/PUBLIC",
      "Allmen tilgang"),
    CodelistEntry(
      "http://publications.europa.eu/resource/authority/access-right/RESTRICTED",
      "betinget tilgang"),
    CodelistEntry(
      "http://publications.europa.eu/resource/authority/access-right/NON_PUBLIC",
      "ikke-allmenn tilgang"),
  )

  /** `geometri_encoding_kodeliste.py` codevalues, lowercased at module
    * scope exactly like the reference (`checks/column.py:5-7`). */
  val geometriEncodingCodevalues: Seq[String] =
    Seq("WKT", "WKB", "geojson", "s2").map(_.toLowerCase(java.util.Locale.ROOT))

  /** Codelist lookup by key — reference `get_codelist`
    * (`common.py:173-185`): remote lists resolve through the provider,
    * local lists from the embedded data, unknown keys → None. The
    * medallion list is plain strings; everything else is entries. */
  def get(key: String, provider: CodelistProvider): Option[Seq[CodelistEntry]] =
    key match {
      case "hovedkategori"   => Some(provider.fetch(Urls.hovedkategori))
      case "begrep"          => Some(provider.fetch(Urls.begrep))
      case "tilgangsnivaa"   => Some(tilgangsnivaa)
      case "medaljongnivaa"  => Some(medaljongnivaa.map(v => CodelistEntry(v, v)))
      case "sikkerhetsnivaa" => Some(sikkerhetsnivaa)
      case _                 => None
    }
}

/** Remote-codelist access — injectable so validation runs offline. */
trait CodelistProvider {
  /** Entries of the codelist at `url` (reference
    * `get_valid_codelist_values`, `common.py:71-98`). */
  def fetch(url: String): Seq[CodelistEntry]
}

/** Map-backed provider for tests / air-gapped runs. */
final class FixtureCodelistProvider(lists: Map[String, Seq[CodelistEntry]])
    extends CodelistProvider {
  def fetch(url: String): Seq[CodelistEntry] =
    lists.getOrElse(url, throw new IllegalStateException(s"no fixture codelist for $url"))
}

/** HTTP JSON provider matching the reference's registry protocol
  * (`containeditems[].{id,label}`); compiles offline, exercised only
  * where egress exists. */
final class HttpCodelistProvider extends CodelistProvider {
  private val cache = scala.collection.mutable.Map[String, Seq[CodelistEntry]]()

  def fetch(url: String): Seq[CodelistEntry] = cache.getOrElseUpdate(url, {
    val client = java.net.http.HttpClient.newHttpClient()
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .header("Accept", "application/json").GET().build()
    val res = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    if (res.statusCode() != 200)
      throw new IllegalStateException(s"codelist fetch failed: $url -> ${res.statusCode()}")
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(res.body())
    val items = root.path("containeditems")
    import scala.jdk.CollectionConverters._
    items.elements().asScala.map { item =>
      CodelistEntry(item.path("id").asText(null), item.path("label").asText(null))
    }.toSeq
  })
}
