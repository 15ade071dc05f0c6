package graft.types

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's SQL type system mapped onto Spark SQL types
  * (samza-api/.../sql/schema/SamzaSqlFieldType.java:25-42), plus the
  * row conventions: the implicit `__key__` column every source carries
  * (planner/QueryPlanner.java:218-231) and the `__op__` delete flag
  * (data/SamzaSqlRelMessage.java:39-43), and the pre-flight output
  * validator (planner/SamzaSqlValidator.java:180+).
  */
object FieldTypes {

  val KeyCol = "__key__"
  val OpCol = "__op__"
  val OpDelete = "DELETE"

  /** SamzaSqlFieldType name → Spark DataType. ANY has no Spark analog
    * (SURVEY §1.2) — sources must materialize a concrete key type;
    * BinaryType is the fallback the engine uses for opaque keys. */
  def toSpark(fieldType: String, element: DataType = StringType): DataType =
    fieldType.toUpperCase match {
      case "BYTE" => ByteType
      case "INT16" => ShortType
      case "INT32" => IntegerType
      case "INT64" => LongType
      case "DECIMAL" => DecimalType.SYSTEM_DEFAULT
      case "REAL" => FloatType
      case "FLOAT" | "DOUBLE" => DoubleType // both 8-byte in the reference
      case "STRING" => StringType
      case "DATETIME" => TimestampType
      case "BOOLEAN" => BooleanType
      case "BYTES" => BinaryType
      case "ARRAY" => ArrayType(element)
      case "MAP" => MapType(StringType, element) // string keys only
      case "ROW" => StructType(Nil)
      case "ANY" => BinaryType
      case other => throw new IllegalArgumentException(
        s"unknown SamzaSqlFieldType: $other")
    }

  /** Prepend the implicit `__key__` column (nullable) when absent —
    * every Samza SQL source carries one. */
  def withKey(df: DataFrame, keyExpr: Column): DataFrame =
    if (df.columns.contains(KeyCol)) df
    else df.select((keyExpr.as(KeyCol) +: df.columns.map(col)): _*)

  /** Tag rows as deletes: `__op__ = DELETE` rows become null-value
    * tombstones at the sink (QueryTranslator.java:145-150). */
  def withDeleteFlag(df: DataFrame, isDelete: Column): DataFrame =
    df.withColumn(OpCol, when(isDelete, OpDelete).otherwise(lit(null)))

  /** Sink-side tombstone application for bounded materialization. */
  def applyOps(df: DataFrame): DataFrame =
    df.filter(col(OpCol).isNull || col(OpCol) =!= OpDelete).drop(OpCol)

  /** Pre-flight output validation: the produced schema must structurally
    * match the sink schema — same fields, compatible types, and no
    * nullable column feeding a non-nullable sink field
    * (SamzaSqlValidator non-nullable rules :214-254).
    * Returns human-readable violations; empty = valid. */
  def validateOutput(produced: StructType, sink: StructType): Seq[String] = {
    val producedMap = produced.fields.map(f => f.name -> f).toMap
    val missing = sink.fields.filterNot(f => producedMap.contains(f.name))
      .map(f => s"missing output field: ${f.name}")
    val extra = produced.fields
      .filterNot(f => sink.fields.exists(_.name == f.name))
      .filterNot(f => f.name == KeyCol || f.name == OpCol)
      .map(f => s"unexpected output field: ${f.name}")
    val mismatched = sink.fields.flatMap { sf =>
      producedMap.get(sf.name).toSeq.flatMap { pf =>
        val typeErr =
          if (pf.dataType != sf.dataType)
            Seq(s"type mismatch for ${sf.name}: " +
              s"${pf.dataType.simpleString} vs ${sf.dataType.simpleString}")
          else Nil
        val nullErr =
          if (pf.nullable && !sf.nullable)
            Seq(s"nullable output feeds non-nullable sink field: ${sf.name}")
          else Nil
        typeErr ++ nullErr
      }
    }
    (missing ++ extra ++ mismatched).toSeq
  }
}
