package graft.types

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.Schema.Type._
import org.apache.spark.sql.types._

/** Avro schema → Spark SQL schema conversion with the reference's
  * rules (samza-sql/.../avro/AvroTypeFactoryImpl.java 171 LoC +
  * AvroRelConverter.java:128-220):
  *  - records → nested StructType (:128)
  *  - arrays → ArrayType (:198)
  *  - maps → MapType with string keys (:203)
  *  - unions → the first non-null branch (:208); nullability from the
  *    presence of a null branch
  *  - enum → string (:215)
  *  - fixed / bytes → binary (:217-220)
  *
  * Samza SQL sources are Avro-config-described
  * (ConfigBasedAvroRelSchemaProviderFactory); here the same converter
  * feeds Spark readers/validators so an Avro-described source keeps an
  * identical schema contract.
  */
object AvroBridge {

  def toStructType(schema: Schema): StructType = {
    require(schema.getType == RECORD, s"expected record, got ${schema.getType}")
    StructType(schema.getFields.asScala.toSeq.map { f =>
      val (dt, nullable) = toDataType(f.schema())
      StructField(f.name(), dt, nullable)
    })
  }

  /** (DataType, nullable). All fields are nullable unless proven
    * otherwise — matching the reference's lenient nullability. */
  def toDataType(schema: Schema): (DataType, Boolean) = schema.getType match {
    case BOOLEAN => (BooleanType, false)
    case INT => (IntegerType, false)
    case LONG => (LongType, false)
    case FLOAT => (FloatType, false)
    case DOUBLE => (DoubleType, false)
    case STRING => (StringType, false)
    case ENUM => (StringType, false)             // enum → string
    case BYTES | FIXED => (BinaryType, false)    // fixed/bytes → binary
    case RECORD => (toStructType(schema), false)
    case ARRAY =>
      val (et, en) = toDataType(schema.getElementType)
      (ArrayType(et, containsNull = en), false)
    case MAP =>
      val (vt, vn) = toDataType(schema.getValueType)
      (MapType(StringType, vt, valueContainsNull = vn), false)
    case UNION =>
      val branches = schema.getTypes.asScala
      val hasNull = branches.exists(_.getType == NULL)
      // value of the first non-null branch (AvroRelConverter.java:208)
      branches.find(_.getType != NULL) match {
        case Some(b) => val (dt, _) = toDataType(b); (dt, hasNull)
        case None => (NullType, true)
      }
    case NULL => (NullType, true)
    case other => throw new IllegalArgumentException(
      s"unsupported avro type: $other")
  }

  def parse(json: String): Schema = new Schema.Parser().parse(json)
}
