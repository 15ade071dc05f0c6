package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Cast, CreateNamedStruct, Expression, RLike}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

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

    // Flatten(arr): the project-level unnest. Spark SQL's lateral-view
    // explode covers the operator form; for expression position the
    // reference's Flatten on a non-array is identity
    // (ProjectTranslator.java:166-169) — callers use explode_outer
    // through the DSL (see RelationalQueries q_flatten).
  }
}
