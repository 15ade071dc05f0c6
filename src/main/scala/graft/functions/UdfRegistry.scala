package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.types.DataType

/** Polymorphic UDF registration with analysis-time operand checking —
  * the analog of the reference's multi-overload UDF surface:
  * several `@SamzaSqlUdfMethod` methods per UDF resolved by argument
  * type (samza-test/.../TestSamzaSqlEndToEnd.java:719), with
  * arity/type validation at planning time
  * (samza-sql/.../planner/Checker.java:45 getOperandCountRange /
  * checkOperandTypes — bad calls fail ANALYSIS, not execution).
  *
  * Resolution order per call site, mirroring Calcite's operand
  * checker: (1) an overload whose parameter types match the argument
  * types exactly (nullability ignored); (2) an overload every argument
  * can losslessly up-cast to (casts inserted, so the chosen overload
  * still sees its declared types); otherwise an analysis error listing
  * the registered signatures.
  */
object UdfRegistry {

  /** One typed overload: parameter types plus the expression builder
    * invoked with arguments already conformed to `paramTypes`. */
  final case class Overload(paramTypes: Seq[DataType],
      build: Seq[Expression] => Expression)

  def register(spark: SparkSession, name: String,
      overloads: Seq[Overload]): Unit = {
    require(overloads.nonEmpty, s"UDF $name needs at least one overload")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name.toLowerCase, exprs => resolve(name, overloads, exprs), "built-in")
  }

  /** Structural type equality ignoring nullability (DataType.sameType
    * is private[sql]). */
  private def sameType(a: DataType, b: DataType): Boolean = {
    import org.apache.spark.sql.types._
    (a, b) match {
      case (ArrayType(ae, _), ArrayType(be, _)) => sameType(ae, be)
      case (MapType(ak, av, _), MapType(bk, bv, _)) =>
        sameType(ak, bk) && sameType(av, bv)
      case (StructType(af), StructType(bf)) =>
        af.length == bf.length && af.zip(bf).forall { case (x, y) =>
          x.name == y.name && sameType(x.dataType, y.dataType) }
      case _ => a == b
    }
  }

  private def signatures(name: String, overloads: Seq[Overload]): String =
    overloads.map(o =>
      s"$name(${o.paramTypes.map(_.simpleString).mkString(", ")})")
      .mkString("; ")

  private def resolve(name: String, overloads: Seq[Overload],
      args: Seq[Expression]): Expression = {
    val byArity = overloads.filter(_.paramTypes.length == args.length)
    if (byArity.isEmpty)
      throw new IllegalArgumentException(
        s"$name: wrong number of arguments (${args.length}); " +
          s"registered: ${signatures(name, overloads)}")
    val argTypes = args.map(_.dataType)
    val exact = byArity.find(o =>
      o.paramTypes.zip(argTypes).forall { case (p, a) => sameType(p, a) })
    exact match {
      case Some(o) => o.build(args)
      case None =>
        val upcastable = byArity.find(o =>
          o.paramTypes.zip(argTypes).forall { case (p, a) =>
            Cast.canUpCast(a, p) })
        upcastable match {
          case Some(o) =>
            o.build(args.zip(o.paramTypes).map { case (a, p) =>
              if (sameType(a.dataType, p)) a else Cast(a, p) })
          case None =>
            throw new IllegalArgumentException(
              s"$name: no overload accepts " +
                s"(${argTypes.map(_.simpleString).mkString(", ")}); " +
                s"registered: ${signatures(name, overloads)}")
        }
    }
  }
}
