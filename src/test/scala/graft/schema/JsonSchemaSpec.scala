package graft.schema

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Branch coverage for the JSON-Schema compiler per FIXTURES.md §4
  * (behaviors cited from `felleskomponenter/schema.py`). */
class JsonSchemaSpec extends AnyFunSuite {

  private def field(st: StructType, name: String): StructField =
    st.fields.find(_.name == name).getOrElse(fail(s"missing field $name"))

  test("primitive type mapping (schema.py:6-15)") {
    val st = JsonSchemaToStruct.convert(
      """{"properties": {
        |  "s": {"type": "string"}, "n": {"type": "number"},
        |  "f": {"type": "float"}, "i": {"type": "integer"},
        |  "b": {"type": "boolean"}
        |}}""".stripMargin)
    assert(field(st, "s").dataType == StringType)
    assert(field(st, "n").dataType == DoubleType)
    assert(field(st, "f").dataType == FloatType)
    assert(field(st, "i").dataType == LongType)
    assert(field(st, "b").dataType == BooleanType)
  }

  test("required list controls nullability (schema.py:34-37)") {
    val st = JsonSchemaToStruct.convert(
      """{"required": ["a"],
        | "properties": {"a": {"type": "string"}, "b": {"type": "string"}}}""".stripMargin)
    assert(!field(st, "a").nullable)
    assert(field(st, "b").nullable)
  }

  test("enforceRequiredField=false reproduces the reference's boolean exactly") {
    // quirk: nullable = (name not in required) AND enforce — with
    // enforce=false and a required list present, everything is
    // non-nullable (schema.py:36)
    val st = JsonSchemaToStruct.convert(
      """{"required": ["a"],
        | "properties": {"a": {"type": "string"}, "b": {"type": "string"}}}""".stripMargin,
      enforceRequiredField = false)
    assert(!field(st, "a").nullable)
    assert(!field(st, "b").nullable)
  }

  test("no required list → everything nullable") {
    val st = JsonSchemaToStruct.convert(
      """{"properties": {"a": {"type": "string"}}}""")
    assert(field(st, "a").nullable)
  }

  test("const fields are dropped (schema.py:57-58)") {
    val st = JsonSchemaToStruct.convert(
      """{"properties": {
        |  "version": {"const": "1.0"}, "keep": {"type": "string"}}}""".stripMargin)
    assert(st.fields.map(_.name).toSeq == Seq("keep"))
  }

  test("enum → StringType (schema.py:61-69)") {
    val st = JsonSchemaToStruct.convert(
      """{"properties": {"e": {"enum": [1, 2, 3]}}}""")
    assert(field(st, "e").dataType == StringType)
  }

  test("unknown/missing type → configurable default (schema.py:117-124)") {
    val st = JsonSchemaToStruct.convert(
      """{"properties": {"x": {"type": "mystery"}, "y": {}}}""")
    assert(field(st, "x").dataType == StringType)
    assert(field(st, "y").dataType == StringType)
    val st2 = JsonSchemaToStruct.convert(
      """{"properties": {"x": {}}}""", defaultType = "integer")
    assert(field(st2, "x").dataType == LongType)
  }

  test("arrays: element type from items; empty items → default (schema.py:80-100)") {
    val st = JsonSchemaToStruct.convert(
      """{"properties": {
        |  "nums": {"type": "array", "items": {"type": "integer"}},
        |  "untyped": {"type": "array"}}}""".stripMargin)
    assert(field(st, "nums").dataType == ArrayType(LongType))
    assert(field(st, "untyped").dataType == ArrayType(StringType))
  }

  test("nested objects recurse with paths (schema.py:101-116)") {
    val st = JsonSchemaToStruct.convert(
      """{"properties": {
        |  "outer": {"type": "object", "required": ["a"],
        |    "properties": {"a": {"type": "integer"}, "b": {"type": "string"}}}}}""".stripMargin)
    val outer = field(st, "outer").dataType.asInstanceOf[StructType]
    assert(!field(outer, "a").nullable)
    assert(field(outer, "b").nullable)
    assert(field(outer, "a").metadata.getString("path") ==
      "#/properties/outer/properties/a")
  }

  test("field metadata carries path and description (schema.py:143-144)") {
    val st = JsonSchemaToStruct.convert(
      """{"properties": {"a": {"type": "string", "description": "a field"}}}""")
    val m = field(st, "a").metadata
    assert(m.getString("path") == "#/properties/a")
    assert(m.getString("description") == "a field")
  }

  test("internal $ref resolves via cursor walk (schema.py:157-165)") {
    val st = JsonSchemaToStruct.convert(
      """{"$def": {"money": {"type": "number", "description": "ref'd"}},
        | "properties": {"amount": {"$ref": "#/$def/money"}}}""".stripMargin)
    assert(field(st, "amount").dataType == DoubleType)
    assert(field(st, "amount").metadata.getString("path") ==
      "#/properties/amount/$ref/#/$def/money")
  }

  test("declared circular reference → StringType (schema.py:61,129-131 intent)") {
    val node = JsonSchemaToStruct.parse(
      """{"$def": {"node": {"type": "object",
        |   "properties": {"next": {"$ref": "#/$def/node"}, "v": {"type": "integer"}}}},
        | "properties": {"root": {"$ref": "#/$def/node"}}}""".stripMargin)
    val st = new JsonSchemaToStruct(node,
      circularReferences = Seq("#/$def/node")).convert()
    // the declared-circular ref short-circuits at first sight
    assert(field(st, "root").dataType == StringType)
  }

  test("undeclared cycles break via visited set instead of stack overflow") {
    val st = JsonSchemaToStruct.convert(
      """{"$def": {"node": {"type": "object",
        |   "properties": {"next": {"$ref": "#/$def/node"}, "v": {"type": "integer"}}}},
        | "properties": {"root": {"$ref": "#/$def/node"}}}""".stripMargin)
    val root = field(st, "root").dataType.asInstanceOf[StructType]
    assert(field(root, "next").dataType == StringType) // cycle cut here
    assert(field(root, "v").dataType == LongType)
  }

  test("external $ref: base-uri join, fragment walk, fetch cache (schema.py:146-182)") {
    var fetches = 0
    val external = JsonSchemaToStruct.parse(
      """{"defs": {"addr": {"type": "object",
        |  "properties": {"street": {"type": "string"}}}}}""".stripMargin)
    val root = JsonSchemaToStruct.parse(
      """{"properties": {
        |  "home": {"$ref": "schemas/addr.json#/defs/addr"},
        |  "work": {"$ref": "schemas/addr.json#/defs/addr"}}}""".stripMargin)
    val st = new JsonSchemaToStruct(root,
      externalRefBaseUri = "https://example.test",
      fetchExternal = url => {
        fetches += 1
        assert(url == "https://example.test/schemas/addr.json")
        external
      }).convert()
    assert(fetches == 1) // second ref served from the cache
    val home = field(st, "home").dataType.asInstanceOf[StructType]
    assert(field(home, "street").dataType == StringType)
  }

  test("no properties → error (schema.py:54)") {
    intercept[IllegalArgumentException] {
      JsonSchemaToStruct.convert("""{"title": "empty"}""")
    }
  }
}
