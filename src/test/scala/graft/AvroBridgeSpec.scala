package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.types.AvroBridge

/** Conversion rules over a ComplexRecord-shaped schema (FIXTURES.md §1:
  * full type-system coverage — nested record, union, enum, fixed,
  * arrays, maps). */
class AvroBridgeSpec extends AnyFunSuite {

  private val complex = AvroBridge.parse(
    """{
      |  "type": "record", "name": "ComplexRecord", "fields": [
      |    {"name": "id", "type": "int"},
      |    {"name": "bool_value", "type": "boolean"},
      |    {"name": "double_value", "type": ["null", "double"]},
      |    {"name": "string_value", "type": ["null", "string"]},
      |    {"name": "bytes_value", "type": "bytes"},
      |    {"name": "fixed_value",
      |     "type": {"type": "fixed", "name": "MyFixed", "size": 16}},
      |    {"name": "enum_value",
      |     "type": {"type": "enum", "name": "Kind",
      |              "symbols": ["HOME", "WORK"]}},
      |    {"name": "array_values",
      |     "type": {"type": "array", "items": "string"}},
      |    {"name": "map_values",
      |     "type": {"type": "map", "values": "string"}},
      |    {"name": "sub_values", "type": {
      |      "type": "record", "name": "SubRecord", "fields": [
      |        {"name": "sub_id", "type": "int"},
      |        {"name": "sub_name", "type": ["null", "string"]}]}}
      |  ]
      |}""".stripMargin)

  test("record converts to StructType with reference rules") {
    val st = AvroBridge.toStructType(complex)
    def f(n: String) = st.fields.find(_.name == n).get

    assert(f("id").dataType == IntegerType && !f("id").nullable)
    assert(f("bool_value").dataType == BooleanType)
    // union [null, double] → double, nullable (first non-null branch)
    assert(f("double_value").dataType == DoubleType && f("double_value").nullable)
    assert(f("string_value").dataType == StringType && f("string_value").nullable)
    assert(f("bytes_value").dataType == BinaryType)
    assert(f("fixed_value").dataType == BinaryType)  // fixed → binary
    assert(f("enum_value").dataType == StringType)   // enum → string
    assert(f("array_values").dataType == ArrayType(StringType, false))
    assert(f("map_values").dataType ==
      MapType(StringType, StringType, false))       // string keys
    val sub = f("sub_values").dataType.asInstanceOf[StructType]
    assert(sub.fieldNames.toSeq == Seq("sub_id", "sub_name"))
  }

  test("non-record top level is rejected") {
    intercept[IllegalArgumentException] {
      AvroBridge.toStructType(AvroBridge.parse("\"string\""))
    }
  }
}
