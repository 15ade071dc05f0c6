package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue
import org.apache.spark.sql.catalyst.expressions.{Cast, CreateNamedStruct, Expression, Literal, RLike}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** The reference's built-in SQL UDF set (samza-sql/.../fn/): Flatten,
  * RegexMatch, GetNestedField, ConvertToString, BuildOutputRecord —
  * registered into Spark SQL as NATIVE Catalyst expressions, not Scala
  * UDFs, so they stay inside whole-stage codegen. Each also has a
  * Column-API twin for the DSL surface.
  *
  * Registration is case-insensitive by lowercasing the name — Samza
  * resolves UDFs case-insensitively (planner/QueryPlanner.java:159) and
  * Spark's function registry is case-insensitive already.
  */
object Udfs {

  /** RegexMatch(regex, str) → BOOLEAN. NOTE the reference's argument
    * order is (regex, string) — samza-sql/.../fn/RegexMatchUdf.java. */
  def regexMatch(regex: Column, str: Column): Column = regexp_like(str, regex)

  /** Column-level nested-field access by dotted path —
    * GetNestedField(record, 'a.b.c') with the path resolved at plan
    * time (static paths cover every reference usage). */
  def getNestedField(record: Column, path: String): Column =
    path.split('.').foldLeft(record)((c, f) => c.getField(f))

  /** BuildOutputRecord('k1', v1, 'k2', v2, …) → nested record. */
  def buildOutputRecord(pairs: (String, Column)*): Column =
    struct(pairs.map { case (n, c) => c.as(n) }: _*)

  /** ConvertToString(any) → STRING. */
  def convertToString(c: Column): Column = c.cast("string")

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry

    def temp(name: String)(builder: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name.toLowerCase, builder, "built-in")

    // RegexMatch(regex, str): reference arg order is (regex, string)
    temp("RegexMatch") { case Seq(regex, str) => RLike(str, regex) }

    // ConvertToString(x)
    temp("ConvertToString") { case Seq(e) => Cast(e, StringType) }

    // BuildOutputRecord(k1, v1, ...) = named_struct
    temp("BuildOutputRecord") { exprs => CreateNamedStruct(exprs) }

    // GetNestedField(record, 'a.b.c'): dotted path resolved at plan
    // time into an ExtractValue chain (the path must be a literal,
    // which covers every reference usage — GetNestedFieldUdf)
    temp("GetNestedField") { case Seq(rec, pathExpr) =>
      val path = pathExpr match {
        case Literal(s: UTF8String, StringType) => s.toString
        case other => throw new IllegalArgumentException(
          s"GetNestedField path must be a string literal, got $other")
      }
      path.split('.').foldLeft(rec) { (e, f) =>
        UnresolvedExtractValue(e, Literal(f))
      }
    }

    // Flatten(arr): the project-level unnest. Spark SQL's lateral-view
    // explode covers the operator form; for expression position the
    // reference's Flatten on a non-array is identity
    // (ProjectTranslator.java:166-169) — callers use explode_outer
    // through the DSL (see RelationalQueries q_flatten).
  }
}
