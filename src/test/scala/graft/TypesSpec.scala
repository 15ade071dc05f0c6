package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.types.FieldTypes

class TypesSpec extends SparkSpec {

  test("field-type lattice maps to Spark types") {
    assert(FieldTypes.toSpark("INT32") == IntegerType)
    assert(FieldTypes.toSpark("INT64") == LongType)
    assert(FieldTypes.toSpark("FLOAT") == DoubleType) // 8-byte in reference
    assert(FieldTypes.toSpark("DOUBLE") == DoubleType)
    assert(FieldTypes.toSpark("REAL") == FloatType)
    assert(FieldTypes.toSpark("DATETIME") == TimestampType)
    assert(FieldTypes.toSpark("BYTES") == BinaryType)
    assert(FieldTypes.toSpark("ANY") == BinaryType)
    assert(FieldTypes.toSpark("MAP", IntegerType) ==
      MapType(StringType, IntegerType))
    intercept[IllegalArgumentException](FieldTypes.toSpark("VOID"))
  }

  test("__key__ is prepended once") {
    val s = spark
    import s.implicits._
    val df = Seq((1, "a")).toDF("id", "v")
    val keyed = FieldTypes.withKey(df, col("id"))
    assert(keyed.columns.head == "__key__")
    assert(FieldTypes.withKey(keyed, col("id")).columns.count(_ == "__key__") == 1)
  }

  test("__op__ DELETE rows are dropped at the sink") {
    val s = spark
    import s.implicits._
    val df = Seq((1, "keep"), (2, "drop")).toDF("id", "v")
    val flagged = FieldTypes.withDeleteFlag(df, col("id") === 2)
    val out = FieldTypes.applyOps(flagged).as[(Int, String)].collect().toSet
    assert(out == Set((1, "keep")))
  }

  test("output validator catches missing, extra, type and null violations") {
    val sink = StructType(Seq(
      StructField("a", IntegerType, nullable = false),
      StructField("b", StringType, nullable = true)))
    val ok = StructType(Seq(
      StructField("a", IntegerType, nullable = false),
      StructField("b", StringType, nullable = true)))
    assert(FieldTypes.validateOutput(ok, sink).isEmpty)

    val bad = StructType(Seq(
      StructField("a", LongType, nullable = true), // wrong type + nullable
      StructField("c", StringType, nullable = true))) // extra; b missing
    val errs = FieldTypes.validateOutput(bad, sink)
    assert(errs.exists(_.contains("missing output field: b")))
    assert(errs.exists(_.contains("unexpected output field: c")))
    assert(errs.exists(_.contains("type mismatch for a")))
    assert(errs.exists(_.contains("non-nullable sink field: a")))
  }
}
