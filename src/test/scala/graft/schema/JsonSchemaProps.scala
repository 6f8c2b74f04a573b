package graft.schema

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.types._

/** Random-schema robustness for the JSON-Schema compiler: arbitrary
  * nested schemas never crash, nullability follows the required-list
  * law, and every compiled field carries its path metadata. */
object JsonSchemaProps extends Properties("JsonSchemaToStruct") {

  private val genName: Gen[String] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))

  private val genPrimitive: Gen[String] =
    Gen.oneOf("string", "number", "float", "integer", "boolean", "unknowntype")

  private def genNode(depth: Int): Gen[String] =
    if (depth <= 0) genPrimitive.map(t => s"""{"type": "$t"}""")
    else Gen.frequency(
      4 -> genPrimitive.map(t => s"""{"type": "$t"}"""),
      1 -> Gen.const("""{"enum": ["a", "b"]}"""),
      1 -> Gen.const("""{"const": "fixed"}"""),
      2 -> genNode(depth - 1).map(inner => s"""{"type": "array", "items": $inner}"""),
      2 -> genObject(depth - 1),
    )

  private def genObject(depth: Int): Gen[String] = for {
    n <- Gen.choose(1, 4)
    names <- Gen.listOfN(n, genName).map(_.distinct)
    nodes <- Gen.sequence[List[String], String](names.map(_ => genNode(depth)))
    required <- Gen.someOf(names)
  } yield {
    val props = names.zip(nodes).map { case (k, v) => s""""$k": $v""" }.mkString(", ")
    val req = required.map(r => s""""$r"""").mkString("[", ", ", "]")
    s"""{"type": "object", "required": $req, "properties": {$props}}"""
  }

  private val genSchema: Gen[String] = genObject(3)

  property("random schemas compile without crashing; fields ⊆ properties") =
    forAll(genSchema) { schema =>
      val st = JsonSchemaToStruct.convert(schema)
      st.fields.forall(_.metadata.contains("path"))
    }

  property("nullability law: nullable == (!required && enforce)") =
    forAll(genSchema, Gen.oneOf(true, false)) { (schema, enforce) =>
      val node = JsonSchemaToStruct.parse(schema)
      val st = new JsonSchemaToStruct(node, enforceRequiredField = enforce).convert()
      val required = {
        val r = node.path("required")
        val it = r.elements()
        val buf = scala.collection.mutable.Set[String]()
        while (it.hasNext) buf += it.next().asText()
        buf.toSet
      }
      st.fields.forall { f =>
        f.nullable == (!required.contains(f.name) && enforce)
      }
    }

  property("const fields are always dropped") = {
    val withConst = genName.map(n =>
      s"""{"properties": {"$n": {"const": 1}, "keep": {"type": "string"}}}""")
    forAll(withConst) { schema =>
      val st = JsonSchemaToStruct.convert(schema)
      st.fields.map(_.name).toSeq == Seq("keep")
    }
  }

  property("array element types compile to ArrayType") =
    forAll(genNode(1)) { inner =>
      val st = JsonSchemaToStruct.convert(
        s"""{"properties": {"arr": {"type": "array", "items": $inner}}}""")
      st.fields.isEmpty || st.fields.head.dataType.isInstanceOf[ArrayType]
    }
}
