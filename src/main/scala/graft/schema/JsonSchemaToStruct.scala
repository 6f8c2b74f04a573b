package graft.schema

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** JSON Schema → Spark `StructType` compiler — the engine's equivalent
  * of the reference's `Json2Spark`
  * (`/root/reference/src/dask_felleskomponenter/felleskomponenter/schema.py:5-198`).
  *
  * Behavior reproduced:
  *  - type mapping string/decimal/number/float/integer/boolean/
  *    timestamp/date → String/Decimal/Double/Float/Long/Boolean/
  *    Timestamp/Date (`schema.py:6-15`);
  *  - `const` fields are dropped (`:57-58`); `enum` → StringType
  *    (`:61-69`); unknown or missing `type` → the configured
  *    `defaultType` (`:117-124`);
  *  - arrays take their element type from `items` (first compiled
  *    field), defaulting when `items` is empty (`:80-100`); nested
  *    objects recurse (`:101-116`);
  *  - nullability: with a `required` list present, a field is nullable
  *    iff it is NOT listed AND `enforceRequiredField` is true — the
  *    reference's exact boolean (`:34-37`), including the quirk that
  *    `enforceRequiredField=false` makes listed siblings non-nullable;
  *    without a `required` list everything is nullable;
  *  - every field carries metadata `{path, description}` (`:143-144`);
  *  - internal refs (`#/...`) resolve by cursor walk (`:133-138`,
  *    `:157-165`); external refs join `externalRefBaseUri`, split an
  *    optional `#fragment`, and fetch through an injectable resolver
  *    with a per-instance cache (`:146-155`, `:166-182`) — offline
  *    tests inject a map-backed resolver;
  *  - refs listed in `circularReferences` compile to StringType. (In
  *    the reference the guard (`:61,129-131`) sits after the `$ref`
  *    dispatch (`:59-60`) and so can never interrupt a ref chain; the
  *    intent is unambiguous, so here the guard is checked before
  *    resolving. A visited-ref set additionally breaks undeclared
  *    cycles instead of overflowing the stack.)
  */
class JsonSchemaToStruct(
    json: JsonNode,
    enforceRequiredField: Boolean = true,
    defaultType: String = "string",
    defsLocation: String = "$def",
    circularReferences: Seq[String] = Nil,
    externalRefBaseUri: String = "",
    fetchExternal: String => JsonNode = url =>
      throw new IllegalStateException(s"no external resolver injected for: $url")) {

  private val typeMapping: Map[String, DataType] = Map(
    "string"    -> StringType,
    "decimal"   -> DecimalType.USER_DEFAULT,
    "number"    -> DoubleType,
    "float"     -> FloatType,
    "integer"   -> LongType,
    "boolean"   -> BooleanType,
    "timestamp" -> TimestampType,
    "date"      -> DateType,
  )

  private val fetched = scala.collection.mutable.Map[String, JsonNode]()
  private val defaultDataType: DataType = typeMapping.getOrElse(defaultType, StringType)

  def convert(): StructType = {
    val properties = json.path("properties")
    if (!properties.isObject || properties.isEmpty)
      throw new IllegalArgumentException("No properties found in JSON schema")
    val required = requiredFields(json)
    val fields = properties.properties().asScala.toSeq.flatMap { e =>
      propertyToFields(e.getValue, e.getKey, s"#/properties/${e.getKey}", required,
        visited = Set.empty)
    }
    StructType(fields)
  }

  private def requiredFields(node: JsonNode): Option[Set[String]] = {
    val r = node.path("required")
    if (r.isArray) Some(r.elements().asScala.map(_.asText()).toSet) else None
  }

  private def nullable(fieldName: String, required: Option[Set[String]]): Boolean =
    required match {
      case Some(set) => !set.contains(fieldName) && enforceRequiredField
      case None      => true
    }

  private def metadata(path: String, description: String): Metadata =
    new MetadataBuilder()
      .putString("path", path)
      .putString("description", description)
      .build()

  private def descriptionOf(node: JsonNode): String =
    if (node.hasNonNull("description")) node.get("description").asText() else ""

  private def propertyToFields(node: JsonNode, fieldName: String, path: String,
      required: Option[Set[String]], visited: Set[String]): Seq[StructField] = {
    def leaf(dt: DataType): Seq[StructField] =
      Seq(StructField(fieldName, dt, nullable(fieldName, required),
        metadata(path, descriptionOf(node))))

    if (node.has("const")) Nil
    else if (node.has("$ref")) {
      val ref = node.get("$ref").asText()
      if (circularReferences.contains(ref) || visited.contains(ref)) leaf(StringType)
      else resolveRef(ref, path, fieldName, visited + ref)
    } else if (node.has("enum")) leaf(StringType)
    else if (node.has("type")) {
      node.get("type").asText() match {
        case t @ ("string" | "number" | "float" | "integer" | "boolean") =>
          leaf(typeMapping.getOrElse(t, StringType))
        case "array" =>
          val items = node.path("items")
          val itemStructs =
            if (items.isObject)
              propertyToFields(items, "", path + "/items", requiredFields(items), visited)
            else Nil
          val elementType = itemStructs.headOption.map(_.dataType).getOrElse(defaultDataType)
          leaf(ArrayType(elementType))
        case "object" =>
          val props = node.path("properties")
          val nested =
            if (props.isObject)
              props.properties().asScala.toSeq.flatMap { e =>
                propertyToFields(e.getValue, e.getKey, s"$path/properties/${e.getKey}",
                  requiredFields(node), visited)
              }
            else Nil
          leaf(StructType(nested))
        case _ => leaf(defaultDataType)
      }
    } else leaf(defaultDataType)
  }

  /** Walk `#/a/b/c` from the schema root (the reference's cursor walk
    * strips every leading '#'/'/' char, `schema.py:133-138`). */
  private def cursorAt(path: String): JsonNode = {
    val parts = path.dropWhile(c => c == '#' || c == '/').split("/")
    parts.foldLeft(json)((cursor, part) => cursor.path(part))
  }

  private def resolveRef(resourcePath: String, basePath: String, fieldName: String,
      visited: Set[String]): Seq[StructField] = {
    if (resourcePath.startsWith("#")) {
      val cursor = cursorAt(resourcePath)
      propertyToFields(cursor, fieldName, s"$basePath/$$ref/$resourcePath",
        requiredFields(cursor), visited)
    } else {
      val full =
        if (resourcePath.startsWith("http")) resourcePath
        else s"$externalRefBaseUri/$resourcePath"
      val (schemaUrl, fragment) = full.indexOf('#') match {
        case -1 => (full, "")
        case i  => (full.substring(0, i), full.substring(i + 1).dropWhile(_ == '/'))
      }
      val external = fetched.getOrElseUpdate(schemaUrl, fetchExternal(schemaUrl))
      val target =
        if (fragment.isEmpty) external
        else fragment.split("/").foldLeft(external)((c, p) => c.path(p))
      propertyToFields(target, fieldName, s"$basePath/file/$full",
        required = None, visited)
    }
  }
}

object JsonSchemaToStruct {
  private val mapper = new ObjectMapper()

  def parse(jsonText: String): JsonNode = mapper.readTree(jsonText)

  /** Reference convenience entry (`schema.py:185-198`). */
  def convert(jsonText: String, enforceRequiredField: Boolean = true,
      defaultType: String = "string", defsLocation: String = "$def"): StructType =
    new JsonSchemaToStruct(parse(jsonText), enforceRequiredField, defaultType,
      defsLocation).convert()
}
